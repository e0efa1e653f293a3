"""stream_source_cap: per-group token budgets across micro-batches.

Two deterministic micro-batches (maxFilesPerTrigger=1, mtime order)
against a sequential reference: budget state must carry across
batches, dropped rows must still consume budget (stream-window
semantics), and a fresh group arriving late must start at zero.
"""

import os
import time

import pytest

from tokcodec.stateful import stream_source_cap

CAP = 10


def _write(spark, rows, path, mtime):
    df = spark.createDataFrame(
        rows, "source string, doc_id long, n_tok int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)
    for root, _d, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))


def test_budget_carries_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    now = time.time()
    # batch 1: s1 consumes 4+4=8 (both kept); s2's first doc (12) blows
    # the cap immediately — dropped but consumes budget
    _write(spark, [("s1", 1, 4), ("s1", 2, 4), ("s2", 1, 12)],
           os.path.join(src, "b1"), now - 120)
    # batch 2: s1 doc 3 (cum 8+3=11 > 10, dropped) then doc 4 would be
    # 14 (dropped); s2 already consumed 12 >= cap so even a tiny doc is
    # dropped; s3 arrives fresh and fits
    _write(spark, [("s1", 3, 3), ("s1", 4, 3), ("s2", 2, 1),
                   ("s3", 1, 9)],
           os.path.join(src, "b2"), now - 60)
    stream = (
        spark.readStream.schema("source string, doc_id long, n_tok int")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "*"))
    )
    q = (
        stream_source_cap(stream, cap=CAP)
        .writeStream.format("memory")
        .queryName("cap_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    kept = sorted(
        (r.source, r.doc_id) for r in spark.table("cap_test").collect()
    )
    assert kept == [("s1", 1), ("s1", 2), ("s3", 1)]


def test_within_batch_order_is_by_id(spark, tmp_path):
    src = str(tmp_path / "src2")
    os.makedirs(src)
    # rows arrive unsorted in one batch; budget must apply in doc_id
    # order: ids 1..4 of 3 tokens each, cap 10 -> ids 1,2,3 kept
    _write(spark, [("s", 4, 3), ("s", 1, 3), ("s", 3, 3), ("s", 2, 3)],
           os.path.join(src, "b1"), time.time() - 60)
    stream = (
        spark.readStream.schema("source string, doc_id long, n_tok int")
        .parquet(os.path.join(src, "*"))
    )
    q = (
        stream_source_cap(stream, cap=CAP)
        .writeStream.format("memory")
        .queryName("cap_test2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    kept = sorted(r.doc_id for r in spark.table("cap_test2").collect())
    assert kept == [1, 2, 3]


def test_bad_args(spark):
    df = spark.readStream.schema(
        "source string, doc_id long, n_tok int"
    ).parquet("/tmp/nonexistent-cap-dir-*")
    with pytest.raises(ValueError, match="cap"):
        stream_source_cap(df, cap=0)
    with pytest.raises(ValueError, match="not in stream"):
        stream_source_cap(df, cap=5, count_col="nope")
