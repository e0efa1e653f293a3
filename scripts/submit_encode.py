#!/usr/bin/env python
"""spark-submit entry point for the encode job (BASELINE.json
north_star: "launched via spark-submit --py-files on multi-executor
clusters"). Encodes a parquet table of pre-tokenized sequences into a
tokcodec encoded table, resumably.

    spark-submit --py-files tokcodec.zip scripts/submit_encode.py \
        --input /data/sequences --output /data/encoded \
        --buckets 400000 --resume --bloom-columns doc_id

On a cluster, ship the package with
``zip -r tokcodec.zip tokcodec`` + ``--py-files tokcodec.zip``; in
local mode the repo root on PYTHONPATH suffices.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="input parquet path")
    p.add_argument("--output", required=True, help="encoded table path")
    p.add_argument("--buckets", type=int, default=0,
                   help="bucket count (0 = auto-size from input bytes)")
    p.add_argument("--run-id", default=None)
    p.add_argument("--resume", action="store_true",
                   help="skip buckets already committed in lineage")
    p.add_argument("--epoch", type=int, default=0)
    p.add_argument("--cluster-by", default=None,
                   help="sort rows by this column within each bucket "
                        "(sharpens zone maps / lengthens runs)")
    p.add_argument("--bloom-columns", default="",
                   help="comma-separated string columns to bloom-index")
    p.add_argument("--uuid-columns", default="",
                   help="comma-separated UUID string columns stored FIXED(16)")
    p.add_argument("--schema-evolution", action="store_true",
                   help="allow additive schema changes on append "
                        "(Iceberg-style: new columns stored nullable, "
                        "omitted nullable columns null-filled)")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from tokcodec.io_tables import suggest_buckets, write_encoded

    spark = SparkSession.builder.appName("tokcodec-encode").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    df = spark.read.parquet(args.input)
    n_buckets = args.buckets
    if n_buckets <= 0:
        jvm = spark.sparkContext._jvm
        p = jvm.org.apache.hadoop.fs.Path(args.input)
        fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        # getContentSummary is recursive — listStatus reported length 0
        # for the subdirectories of partitioned/nested inputs, collapsing
        # n_buckets toward 1 (round-2 ADVICE)
        total = fs.getContentSummary(p).getLength()
        n_buckets = suggest_buckets(total)
    res = write_encoded(
        df, args.output, n_buckets=n_buckets, run_id=args.run_id,
        resume=args.resume, epoch=args.epoch, cluster_by=args.cluster_by,
        bloom_columns=[c for c in args.bloom_columns.split(",") if c],
        uuid_columns=[c for c in args.uuid_columns.split(",") if c],
        schema_evolution=args.schema_evolution,
    )
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
