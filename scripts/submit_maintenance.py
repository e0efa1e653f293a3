#!/usr/bin/env python
"""spark-submit entry point for table maintenance: row-level deletes
(removal lists), compaction of the committed runs into one (optionally
re-bucketing), and/or vacuum of unreferenced files.

    spark-submit --py-files tokcodec.zip scripts/submit_maintenance.py \
        --table /data/encoded --compact --vacuum [--buckets 400000]

    # apply an opt-out list and materialize it in one pass
    spark-submit ... scripts/submit_maintenance.py \
        --table /data/encoded --delete-column doc_id \
        --delete-keys-parquet /lists/optout.parquet --compact --vacuum

Every commit is atomic (one lineage append); vacuum is safe after
compaction. Single writer assumed — do not run while an encode job is
appending to the same table.
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
    p.add_argument("--delete-column", default=None,
                   help="row-level delete (removal list) key column; "
                        "pair with --delete-keys or "
                        "--delete-keys-parquet. Runs BEFORE "
                        "--compact, so compact materializes it.")
    p.add_argument("--delete-keys", default=None,
                   help="comma-separated key values to delete")
    p.add_argument("--delete-keys-parquet", default=None,
                   help="parquet path holding ONE column of keys "
                        "(the opt-out/contamination list shape)")
    p.add_argument("--remap-column", default=None, metavar="COLUMN",
                   help="vocabulary surgery: remap this int/array<int> "
                        "column's ids through --remap-parquet "
                        "(columns old, new), atomically (compaction "
                        "commit). Runs INSTEAD of --compact.")
    p.add_argument("--remap-parquet", default=None,
                   help="parquet with two int columns old,new")
    p.add_argument("--remap-unmapped", default="error",
                   help="'error' (default), 'keep', or an int UNK id")
    p.add_argument("--profile", nargs="?", const="*", default=None,
                   metavar="COLUMNS",
                   help="per-column data profile from metadata only "
                        "(value bounds, nulls, sizes, codec mix, HLL "
                        "NDV where sketched); optionally a comma list "
                        "of columns")
    p.add_argument("--approx-distinct", default=None, metavar="COLUMN",
                   help="approximate distinct count from the column's "
                        "HLL sketch blocks (write with "
                        "sketch_columns=[...]); array columns report "
                        "distinct-ELEMENT count (vocabulary NDV)")
    args = p.parse_args()
    if args.delete_column and not (args.delete_keys
                                   or args.delete_keys_parquet):
        p.error("--delete-column needs --delete-keys or "
                "--delete-keys-parquet")
    if args.remap_column and not args.remap_parquet:
        p.error("--remap-column needs --remap-parquet")
    if args.remap_column and args.compact:
        p.error("--remap-column already rewrites the table; "
                "drop --compact")
    if not (args.compact or args.vacuum or args.describe
            or args.delete_column or args.approx_distinct
            or args.profile or args.remap_column):
        p.error("nothing to do: pass --delete-column, --compact, "
                "--vacuum, --describe, --profile, --remap-column "
                "and/or --approx-distinct")

    from pyspark.sql import SparkSession

    from tokcodec.io_tables import (
        approx_count_distinct_encoded,
        compact_encoded,
        delete_encoded,
        describe_encoded,
        profile_encoded,
        vacuum_encoded,
    )

    spark = SparkSession.builder.appName("tokcodec-maintenance").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    out: dict = {}
    if args.delete_column:
        keys = (spark.read.parquet(args.delete_keys_parquet)
                if args.delete_keys_parquet
                else args.delete_keys.split(","))
        out["delete"] = delete_encoded(
            spark, args.table, args.delete_column, keys,
            delete_id=args.run_id if not args.compact else None,
        )
    if args.remap_column:
        from tokcodec.remap import remap_tokens

        pairs = spark.read.parquet(args.remap_parquet).collect()
        mapping = {int(r[0]): int(r[1]) for r in pairs}
        um = args.remap_unmapped
        if um not in ("error", "keep"):
            um = int(um)
        out["remap"] = remap_tokens(
            spark, args.table, args.remap_column, mapping,
            on_unmapped=um, run_id=args.run_id,
            n_buckets=args.buckets or None,
            cluster_by=args.cluster_by)
    if args.compact:
        out["compact"] = compact_encoded(
            spark, args.table, run_id=args.run_id,
            n_buckets=args.buckets or None, cluster_by=args.cluster_by,
        )
    if args.vacuum:
        out["vacuum"] = vacuum_encoded(spark, args.table)
    if args.describe:
        out["describe"] = describe_encoded(spark, args.table)
    if args.approx_distinct:
        out["approx_distinct"] = approx_count_distinct_encoded(
            spark, args.table, args.approx_distinct)
    if args.profile:
        cols = None if args.profile == "*" else [
            c.strip() for c in args.profile.split(",") if c.strip()]
        out["profile"] = profile_encoded(spark, args.table,
                                         columns=cols)
    # default=str: profile bounds may be date/Decimal values
    print(json.dumps(out, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
