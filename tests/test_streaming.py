"""Structured-Streaming ingest -> resumable encoded table.

The reference's CarpetWriter is a push-Consumer with no time semantics
(CarpetWriter.java:123-130); here micro-batches run the engine's
resumable batch writer through foreachBatch with per-epoch lineage, so
appends union on read while a redelivered batch stays idempotent."""

import os
import time

import pytest
from pyspark.sql import functions as F

from tokcodec import read_encoded, write_encoded
from tokcodec.synth import synth_df


def test_stream_encode_micro_batches(spark, tmp_path):
    from tokcodec.sources import stream_encode

    src_dir = str(tmp_path / "incoming")
    os.makedirs(src_dir)
    enc_path = str(tmp_path / "enc")
    ckpt = str(tmp_path / "ckpt")

    # three files of sequences arriving as a file stream
    full = synth_df(spark, 1500, seed=9, partitions=3)
    full.withColumn("p", F.pmod(F.xxhash64("doc_id"), F.lit(3))) \
        .write.partitionBy("p").mode("overwrite").parquet(src_dir)

    stream = (
        spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(src_dir + "/p=*")
    )
    q = stream_encode(stream, enc_path, n_buckets=4, checkpoint_dir=ckpt,
                      trigger_once=True)
    q.awaitTermination(300)

    dec = read_encoded(spark, enc_path)
    assert dec.count() == 1500
    # every doc decodes exactly once across micro-batch epochs
    assert dec.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0


def test_epoch_append_and_idempotent_redelivery(spark, tmp_path):
    path = str(tmp_path / "enc")
    b1 = synth_df(spark, 500, seed=1, partitions=2)
    b2 = synth_df(spark, 500, seed=2, partitions=2)
    write_encoded(b1, path, n_buckets=4, run_id="e1a", epoch=1)
    write_encoded(b2, path, n_buckets=4, run_id="e2a", epoch=2)
    # redelivery of epoch 1 under a new attempt id: fully skipped
    s = write_encoded(b1, path, n_buckets=4, run_id="e1b", epoch=1, resume=True)
    assert s["skipped_buckets"] == 4
    dec = read_encoded(spark, path)
    # union of both epochs, no duplicates
    assert dec.count() == 1000
    assert dec.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0

def test_watermark_windowed_agg(spark, tmp_path):
    """Watermarked tumbling-window aggregation over a file stream of
    events — the §2.2 streaming category (late rows beyond the
    watermark are dropped from finalized windows)."""
    import os
    import shutil

    src = str(tmp_path / "ev")
    os.makedirs(src)
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.repartition(2).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))  # watermark needs TZ type
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_v"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory").queryName("winagg")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # append mode emits only watermark-finalized windows; batch
    # equivalent must agree on those windows
    got = spark.sql("select window, event_type, n from winagg")
    batch = (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "6 hours"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    j = got.join(batch, ["window", "event_type"], "inner")
    mism = j.filter(got["n"] != batch["n"]).count() if got.count() else 0
    assert mism == 0
    assert got.count() > 0
