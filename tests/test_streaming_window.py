"""Watermark semantics for streaming windowed aggregation.

``q_stream_windowed_counts`` uses complete mode so its oracle parity is
exact; the APPEND-mode contract — a window is emitted exactly once when
the watermark passes its end, and rows older than the watermark are
DROPPED — is only observable across >=2 micro-batches, so it is pinned
here with a deterministic two-file replay (maxFilesPerTrigger=1,
modification-time ordering).

Timeline (1-hour tumbling windows, 1-hour watermark delay).  A window
is only closed to late rows one batch AFTER the watermark passes its
end (eviction happens at batch end, including that batch's rows), so
three batches are needed to observe a drop:
  batch 1: 08:10, 10:05  -> watermark for b2 = 09:05
  batch 2: 10:10         -> [08,09) ends 09:00 < 09:05: finalized and
                            EMITTED with n=1; watermark for b3 = 09:10
  batch 3: 08:20 (LATE)  -> its window was evicted in b2: DROPPED
  [10,11) never closes before the stream ends, so append mode never
  emits it.
"""

import os
import time

import pytest
from pyspark.sql import functions as F


def _write_file(spark, rows, path, mtime):
    df = spark.createDataFrame(rows, "ts string, event_type string")
    df = df.select(F.col("ts").cast("timestamp").alias("ts"), "event_type")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    for root, _dirs, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))


@pytest.mark.usefixtures("spark")
def test_append_mode_drops_late_rows_and_emits_on_watermark(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = str(tmp_path / "src")
    os.makedirs(src)
    now = time.time()
    _write_file(
        spark,
        [("2024-01-01 08:10:00", "a"), ("2024-01-01 10:05:00", "a")],
        os.path.join(src, "b1"),
        now - 180,
    )
    _write_file(
        spark,
        [("2024-01-01 10:10:00", "a")],
        os.path.join(src, "b2"),
        now - 120,
    )
    _write_file(
        spark,
        [("2024-01-01 08:20:00", "a")],
        os.path.join(src, "b3"),
        now - 60,
    )
    stream = (
        spark.readStream.schema("ts timestamp, event_type string")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "*"))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_append_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = [
        (r.w.start.strftime("%H:%M"), r.w.end.strftime("%H:%M"), r.n)
        for r in spark.table("wm_append_test").collect()
    ]
    # exactly one emission: the [08,09) window with the batch-1 count
    # only; the late batch-3 row was DROPPED and [10,11) never
    # finalized => never emitted
    assert out == [("08:00", "09:00", 1)]
    dropped = sum(
        s.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for s in p.get("stateOperators", [])
    )
    assert dropped == 1
