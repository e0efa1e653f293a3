"""Per-chunk bloom filters (reference C4): hash twin equality, zero
false negatives, and real chunk pruning through read_encoded."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from tokcodec.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_params,
    bloom_test_arrow,
    polyhash_batch,
    polyhash_one,
)
from tokcodec.io_tables import read_encoded, write_encoded


@given(st.lists(st.binary(min_size=0, max_size=100), min_size=1,
                max_size=50))
@settings(max_examples=50, deadline=None)
def test_batch_hash_equals_scalar_hash(values):
    data = b"".join(values)
    lengths = np.array([len(v) for v in values], dtype=np.int64)
    batch = polyhash_batch(data, lengths)
    for i, v in enumerate(values):
        assert int(batch[i]) == polyhash_one(v), (i, v)


def test_no_false_negatives_and_some_pruning():
    values = [f"doc-{i:06d}".encode() for i in range(5000)]
    data = b"".join(values)
    lengths = np.array([len(v) for v in values], dtype=np.int64)
    bits, m = bloom_build(data, lengths)
    assert m == len(bits) * 8
    for v in values[::97]:
        g1, g2 = bloom_params(v)
        assert bloom_might_contain(bits, g1, g2)
    # absent keys: FPP must be low (sized ~10 bits/key -> ~1%)
    fp = 0
    probes = 2000
    for i in range(probes):
        g1, g2 = bloom_params(f"absent-{i}".encode())
        fp += bloom_might_contain(bits, g1, g2)
    assert fp / probes < 0.05, fp


def test_bloom_test_arrow_matches_scalar():
    chunks = []
    for c in range(8):
        vals = [f"c{c}-{i}".encode() for i in range(200)]
        data = b"".join(vals)
        lengths = np.array([len(v) for v in vals], dtype=np.int64)
        chunks.append(bloom_build(data, lengths)[0])
    pays = pa.array(chunks, pa.binary())
    g1, g2 = bloom_params(b"c3-77")
    vec = bloom_test_arrow(pays, g1, g2)
    ref = np.array([bloom_might_contain(b, g1, g2) for b in chunks])
    assert (vec == ref).all()
    assert vec[3]  # the true member's chunk must hit


def test_eq_filter_prunes_and_is_exact(spark, tmp_path):
    schema = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("n", T.IntegerType(), False),
    ])
    df = spark.createDataFrame(
        [Row(doc_id=f"doc-{i:05d}", n=i) for i in range(4000)], schema
    )
    path = os.path.join(str(tmp_path), "t")
    write_encoded(df, path, n_buckets=2, run_id="b1",
                  chunk_max_rows=256, bloom_columns=["doc_id"])

    out = read_encoded(spark, path, eq_filter=("doc_id", "doc-01234"))
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["n"] == 1234

    missing = read_encoded(spark, path, eq_filter=("doc_id", "nope"))
    assert missing.count() == 0

    # pruning is real: most chunks' blooms reject the probe
    from tokcodec.bloom import bloom_params as bp, bloom_might_contain as bmc

    blocks = spark.read.option("recursiveFileLookup", "true").parquet(
        os.path.join(path, "blocks"))
    blooms = blocks.filter(
        (F.col("column") == "doc_id") & (F.col("component") == "bloom")
    ).select("payload").collect()
    assert len(blooms) >= 8
    g1, g2 = bp(b"doc-01234")
    hits = sum(bmc(bytes(r["payload"]), g1, g2) for r in blooms)
    assert hits < len(blooms) / 2, (hits, len(blooms))


def test_eq_filter_survives_runs_without_bloom(spark, tmp_path):
    schema = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("n", T.IntegerType(), False),
    ])
    path = os.path.join(str(tmp_path), "t2")
    old = spark.createDataFrame(
        [Row(doc_id=f"old-{i}", n=i) for i in range(100)], schema
    )
    write_encoded(old, path, n_buckets=2, run_id="r0", epoch=0)
    new = spark.createDataFrame(
        [Row(doc_id=f"new-{i}", n=i) for i in range(100)], schema
    )
    write_encoded(new, path, n_buckets=2, run_id="r1", epoch=1,
                  bloom_columns=["doc_id"])
    # value lives in the bloom-less old run: must still be found
    out = read_encoded(spark, path, eq_filter=("doc_id", "old-42")).collect()
    assert len(out) == 1 and out[0]["n"] == 42


def test_bloom_column_must_be_string(spark, tmp_path):
    df = spark.createDataFrame([Row(doc_id="a", n=1)],
                               "doc_id string, n int")
    with pytest.raises(ValueError, match="bloom/enum column"):
        write_encoded(df, os.path.join(str(tmp_path), "x"), n_buckets=1,
                      run_id="r", bloom_columns=["n"])
