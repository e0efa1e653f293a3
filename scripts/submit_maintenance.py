#!/usr/bin/env python
"""spark-submit entry point for table maintenance: compact the
committed runs of an encoded table into one (optionally re-bucketing)
and/or vacuum unreferenced files.

    spark-submit --py-files tokcodec.zip scripts/submit_maintenance.py \
        --table /data/encoded --compact --vacuum [--buckets 400000]

Compaction commits atomically (one lineage append of tombstones +
commits); vacuum is safe afterwards. Single writer assumed — do not
run while an encode job is appending to the same table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--table", required=True, help="encoded table path")
    p.add_argument("--compact", action="store_true")
    p.add_argument("--vacuum", action="store_true")
    p.add_argument("--describe", action="store_true",
                   help="print schema/codec/ratio stats from metadata "
                        "only (no block payload read)")
    p.add_argument("--buckets", type=int, default=0,
                   help="re-bucket during compaction (0 = keep)")
    p.add_argument("--cluster-by", default=None)
    p.add_argument("--run-id", default=None)
    args = p.parse_args()
    if not (args.compact or args.vacuum or args.describe):
        p.error("nothing to do: pass --compact, --vacuum and/or "
                "--describe")

    from pyspark.sql import SparkSession

    from tokcodec.io_tables import (
        compact_encoded,
        describe_encoded,
        vacuum_encoded,
    )

    spark = SparkSession.builder.appName("tokcodec-maintenance").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    out: dict = {}
    if args.compact:
        out["compact"] = compact_encoded(
            spark, args.table, run_id=args.run_id,
            n_buckets=args.buckets or None, cluster_by=args.cluster_by,
        )
    if args.vacuum:
        out["vacuum"] = vacuum_encoded(spark, args.table)
    if args.describe:
        out["describe"] = describe_encoded(spark, args.table)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
