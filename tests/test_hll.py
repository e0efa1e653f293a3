"""HLL sketch blocks: kernel accuracy, merge = union, and
approx_count_distinct_encoded end-to-end (scalar, array-element,
multi-run, time travel, encryption, compaction backfill)."""

import json
import os

import numpy as np
import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from tokcodec.bloom import _mix64_np
from tokcodec.hll import M, hll_estimate, hll_from_hashes, hll_merge
from tokcodec.io_tables import (
    approx_count_distinct_encoded,
    compact_encoded,
    read_encoded,
    write_encoded,
)


def test_kernel_accuracy_across_cardinalities():
    for n in (1, 50, 3000, 100_000, 2_000_000):
        h = _mix64_np(np.arange(1, n + 1, dtype=np.uint64))
        est = hll_estimate(hll_from_hashes(h))
        assert abs(est - n) / n < 0.05, (n, est)


def test_merge_equals_union():
    a = _mix64_np(np.arange(0, 60_000, dtype=np.uint64))
    b = _mix64_np(np.arange(30_000, 100_000, dtype=np.uint64))
    pa_, pb = hll_from_hashes(a).tobytes(), hll_from_hashes(b).tobytes()
    merged = hll_estimate(hll_merge([pa_, pb]))
    union = hll_estimate(hll_from_hashes(np.concatenate([a, b])))
    assert merged == union
    with pytest.raises(ValueError, match="payload length"):
        hll_merge([b"short"])


def _write(spark, path, lo, hi, run_id, epoch=0, **kw):
    schema = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("grp", T.IntegerType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False),
                      False),
    ])
    rows = [Row(doc_id=f"d{i:06d}", grp=i % 37,
                tokens=[(i * 3 + j) % 5000 for j in range(8)])
            for i in range(lo, hi)]
    write_encoded(spark.createDataFrame(rows, schema), path,
                  n_buckets=2, run_id=run_id, epoch=epoch,
                  chunk_max_rows=512,
                  sketch_columns=["doc_id", "grp", "tokens"], **kw)


def test_approx_distinct_end_to_end(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    _write(spark, path, 0, 20_000, "r0")

    r = approx_count_distinct_encoded(spark, path, "doc_id")
    assert abs(r["estimate"] - 20_000) / 20_000 < 0.05, r
    assert r["rows"] == 20_000 and r["chunks"] >= 8

    # low-cardinality scalar int: linear counting regime, near-exact
    g = approx_count_distinct_encoded(spark, path, "grp")
    assert g["estimate"] == 37, g

    # array column: distinct-ELEMENT count (vocabulary NDV)
    v = approx_count_distinct_encoded(spark, path, "tokens")
    exact = read_encoded(spark, path).select(
        F.explode("tokens").alias("t")).distinct().count()
    assert abs(v["estimate"] - exact) / exact < 0.05, (v, exact)


def test_approx_distinct_multi_run_overlap(spark, tmp_path):
    path = os.path.join(str(tmp_path), "m")
    _write(spark, path, 0, 5_000, "r0", epoch=0)
    _write(spark, path, 2_500, 7_500, "r1", epoch=1)  # 50% overlap
    r = approx_count_distinct_encoded(spark, path, "doc_id")
    assert abs(r["estimate"] - 7_500) / 7_500 < 0.05, r
    # time travel: as of epoch 0 only the first run's ids exist
    r0 = approx_count_distinct_encoded(spark, path, "doc_id",
                                       as_of_epoch=0)
    assert abs(r0["estimate"] - 5_000) / 5_000 < 0.05, r0


def test_missing_sketches_and_bad_columns(spark, tmp_path):
    path = os.path.join(str(tmp_path), "nos")
    schema = T.StructType([T.StructField("doc_id", T.StringType(),
                                         False)])
    write_encoded(spark.createDataFrame([Row(doc_id="a")], schema),
                  path, n_buckets=1, run_id="r0")
    with pytest.raises(ValueError, match="no HLL sketch"):
        approx_count_distinct_encoded(spark, path, "doc_id")
    with pytest.raises(ValueError, match="not in encoded table"):
        approx_count_distinct_encoded(spark, path, "zz")
    with pytest.raises(ValueError, match="sketch column"):
        write_encoded(spark.createDataFrame([Row(doc_id="a")], schema),
                      os.path.join(str(tmp_path), "x"), n_buckets=1,
                      run_id="r", sketch_columns=["nope"])


def test_compaction_backfills_sketches(spark, tmp_path):
    path = os.path.join(str(tmp_path), "cmp")
    schema = T.StructType([T.StructField("doc_id", T.StringType(),
                                         False)])
    rows = [Row(doc_id=f"d{i}") for i in range(4_000)]
    write_encoded(spark.createDataFrame(rows, schema), path,
                  n_buckets=2, run_id="r0")  # no sketches
    compact_encoded(spark, path, run_id="c0",
                    sketch_columns=["doc_id"])
    r = approx_count_distinct_encoded(spark, path, "doc_id")
    assert abs(r["estimate"] - 4_000) / 4_000 < 0.05, r


def test_encrypted_column_sketch_is_encrypted(spark, tmp_path):
    path = os.path.join(str(tmp_path), "enc")
    key = bytes(range(32))
    schema = T.StructType([T.StructField("doc_id", T.StringType(),
                                         False)])
    rows = [Row(doc_id=f"d{i}") for i in range(3_000)]
    write_encoded(spark.createDataFrame(rows, schema), path,
                  n_buckets=1, run_id="r0",
                  sketch_columns=["doc_id"],
                  encrypted_columns=["doc_id"], encryption_key=key)
    blocks = spark.read.option("recursiveFileLookup", "true").parquet(
        os.path.join(path, "blocks"))
    hll_rows = blocks.filter(F.col("component") == "hll").collect()
    assert hll_rows and all(
        '"enc":"gcm"' in r["meta"] for r in hll_rows)
    with pytest.raises(ValueError, match="encrypt"):
        approx_count_distinct_encoded(spark, path, "doc_id")
    r = approx_count_distinct_encoded(spark, path, "doc_id",
                                      encryption_key=key)
    assert abs(r["estimate"] - 3_000) / 3_000 < 0.05, r


def test_maintenance_preserves_declared_indexes(spark, tmp_path):
    """The manifest records bloom/sketch columns as advisory index
    declarations; compact and upsert re-index by default instead of
    silently stripping blooms/sketches from rewritten buckets."""
    from tokcodec.io_tables import upsert_encoded

    path = os.path.join(str(tmp_path), "keep")
    _write(spark, path, 0, 4_000, "r0")
    m = json.loads(open(os.path.join(path, "_manifest.json")).read())
    assert m["sketch_columns"] == ["doc_id", "grp", "tokens"]

    compact_encoded(spark, path, run_id="c0")  # no args: inherit
    r = approx_count_distinct_encoded(spark, path, "doc_id")
    assert abs(r["estimate"] - 4_000) / 4_000 < 0.05, r

    up = spark.createDataFrame(
        [Row(doc_id="d000001", grp=1, tokens=[1, 2])],
        read_encoded(spark, path).schema)
    upsert_encoded(spark, path, up, "doc_id")
    r2 = approx_count_distinct_encoded(spark, path, "doc_id")
    assert abs(r2["estimate"] - 4_000) / 4_000 < 0.05, r2

    # explicit empty list DROPS sketches at the next compaction
    compact_encoded(spark, path, run_id="c1", sketch_columns=[])
    with pytest.raises(ValueError, match="no HLL sketch"):
        approx_count_distinct_encoded(spark, path, "doc_id")
