"""Per-bucket lineage/metrics + resume logic.

BASELINE.json north_star: "encoded blocks plus per-partition
lineage/metrics (codec chosen, ratio, bytes in/out, checkpoint offset)
written back ... for resumable restarts". The lineage row is the
*commit record*: a bucket is durable iff a committed lineage row for
(bucket, run_id) exists. Blocks are written before lineage, so a crash
between the two leaves orphan blocks that decode ignores (it reads only
(bucket, run_id) pairs present in lineage) and resume re-encodes —
exactly-once without distributed transactions.

The reference's analogue is the file-level extra metadata + footer
commit of a Parquet file (CarpetWriter.java:606-621; footer written at
close, CarpetWriter.java:147-150).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from tokcodec.encode import METRICS_COLUMN


def lineage_from_blocks(blocks: DataFrame) -> DataFrame:
    """Aggregate block rows into one committed lineage row per bucket."""
    is_m = F.col("column") == METRICS_COLUMN
    return (
        blocks.groupBy("run_id", "bucket")
        .agg(
            F.lit("committed").alias("status"),
            F.max(F.when(is_m, F.col("n_rows"))).alias("n_rows"),
            F.sum(F.when(~is_m, F.col("orig_bytes")).otherwise(0)).alias("orig_bytes"),
            F.sum(F.when(~is_m, F.col("enc_bytes")).otherwise(0)).alias("enc_bytes"),
            F.max(F.when(is_m, F.col("codec"))).alias("codecs"),
            F.sum(F.col("checksum")).alias("checksum"),
            F.max(F.when(is_m, F.get_json_object("meta", "$.wall_ms").cast("double")))
            .alias("wall_ms"),
        )
        .withColumn(
            "ratio",
            F.when(F.col("orig_bytes") > 0,
                   F.col("enc_bytes") / F.col("orig_bytes")).otherwise(1.0),
        )
        .withColumn("offset", F.col("bucket").cast("bigint"))
        .withColumn("ts", F.unix_timestamp(F.current_timestamp()).cast("double"))
        .select(
            "run_id", "bucket", "status", "n_rows", "orig_bytes", "enc_bytes",
            "ratio", "codecs", "checksum", "offset", "wall_ms", "ts",
        )
    )


def committed(lineage: DataFrame) -> DataFrame:
    """Winning (bucket, run_id) per bucket: the latest committed run.
    Used both by decode (which blocks to read) and resume (which
    buckets to skip)."""
    w = Window.partitionBy("bucket").orderBy(F.desc("ts"), F.desc("run_id"))
    return (
        lineage.filter(F.col("status") == "committed")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
