"""The lineage commit must be O(buckets of this run), never O(table):
appending a run may not read any pre-existing payload block files
(round-1 verdict: the old commit re-scanned the whole blocks directory
per write — fatal at 100 TB)."""

import os

from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from tokcodec.io_tables import read_encoded, write_encoded

SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
    T.StructField("n_tok", T.IntegerType(), False),
    T.StructField("source", T.StringType(), False),
])


def _mk(spark, lo, hi):
    return spark.createDataFrame(
        [Row(doc_id=f"d{i}", tokens=[i, i + 1, i + 2], n_tok=3,
             source=f"s{i % 3}") for i in range(lo, hi)],
        SCHEMA,
    )


def test_append_never_reads_existing_payload_blocks(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    write_encoded(_mk(spark, 0, 50), path, n_buckets=2, run_id="r1", epoch=0)

    # trash every pre-existing payload file of a data column: if the
    # second commit scans them, the parquet reader blows up
    col_dir = os.path.join(path, "blocks", "col-tokens")
    victims = [f for f in os.listdir(col_dir) if f.endswith(".parquet")]
    assert victims
    for f in victims:
        with open(os.path.join(col_dir, f), "wb") as fh:
            fh.write(b"not a parquet file")

    res = write_encoded(_mk(spark, 50, 100), path, n_buckets=2,
                        run_id="r2", epoch=1)
    assert res["buckets"] == 4  # 2 per epoch, both committed

    # lineage for the new run is correct without having read old blocks
    lin = spark.read.parquet(os.path.join(path, "lineage"))
    r2 = lin.filter(F.col("run_id") == "r2")
    assert r2.count() == 2
    row = r2.agg(F.sum("n_rows"), F.min("enc_bytes"),
                 F.min("checksum")).collect()[0]
    assert row[0] == 50 and row[1] > 0 and row[2] > 0


def test_lineage_matches_block_contents(spark, tmp_path):
    # the metrics-row-derived commit must agree with a direct aggregate
    # over the written data blocks (bytes, rows, checksum sum)
    path = os.path.join(str(tmp_path), "t2")
    write_encoded(_mk(spark, 0, 40), path, n_buckets=2, run_id="r1")
    blocks = spark.read.option("recursiveFileLookup", "true").parquet(
        os.path.join(path, "blocks"))
    data = blocks.filter(F.col("column") != "__bucket_metrics__")
    per_bucket = data.groupBy("bucket").agg(
        F.sum("orig_bytes").alias("ob"),
        F.sum("enc_bytes").alias("eb"),
        F.sum("checksum").alias("ck"),
    )
    lin = spark.read.parquet(os.path.join(path, "lineage"))
    joined = lin.join(per_bucket, "bucket").collect()
    assert len(joined) == 2
    for r in joined:
        assert r["orig_bytes"] == r["ob"]
        assert r["enc_bytes"] == r["eb"]
        assert r["checksum"] == r["ck"]
        assert abs(r["ratio"] - r["eb"] / r["ob"]) < 1e-12
