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
    with pytest.raises(ValueError, match="bloom column"):
        write_encoded(df, os.path.join(str(tmp_path), "x"), n_buckets=1,
                      run_id="r", bloom_columns=["n"])


# ---------------------------------------------------------------- #
# contains_filter: array-element blooms (the contamination scan)    #
# ---------------------------------------------------------------- #

def _token_table(spark, n_docs=2000, width=16):
    """Docs whose token vocabulary is LOCALIZED: doc i's tokens all
    live in [i*width, (i+1)*width) — so each encoded chunk covers a
    narrow vocab slice and a single-token probe should prune most
    chunks via the element bloom."""
    schema = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.LongType(), False), False),
    ])
    rows = [Row(doc_id=f"d{i:05d}",
                tokens=[i * width + j for j in range(width)])
            for i in range(n_docs)]
    return spark.createDataFrame(rows, schema)


def test_contains_filter_prunes_and_is_exact(spark, tmp_path):
    df = _token_table(spark)
    path = os.path.join(str(tmp_path), "tok")
    write_encoded(df, path, n_buckets=2, run_id="r1",
                  chunk_max_rows=128, bloom_columns=["tokens"])

    # token 12345 belongs to exactly doc 12345//16 = 771
    out = read_encoded(spark, path,
                       contains_filter=("tokens", 12345)).collect()
    assert len(out) == 1 and out[0]["doc_id"] == "d00771"

    # absent token (beyond the vocab range): zero rows
    assert read_encoded(
        spark, path, contains_filter=("tokens", 10**9)).count() == 0

    # pruning is real: most element blooms reject the probe
    from tokcodec.bloom import (bloom_might_contain as bmc,
                                bloom_params as bp,
                                element_probe_bytes)

    blocks = spark.read.option("recursiveFileLookup", "true").parquet(
        os.path.join(path, "blocks"))
    blooms = blocks.filter(
        (F.col("column") == "tokens") & (F.col("component") == "bloom")
    ).select("payload", "meta").collect()
    assert len(blooms) >= 8
    assert all(json.loads(r["meta"]).get("elem") == 1 for r in blooms)
    g1, g2 = bp(element_probe_bytes(12345))
    hits = sum(bmc(bytes(r["payload"]), g1, g2) for r in blooms)
    assert hits < len(blooms) / 2, (hits, len(blooms))


def test_contains_filter_direct_reader(spark, tmp_path):
    from tokcodec.io_tables import read_encoded_direct

    df = _token_table(spark, n_docs=800)
    path = os.path.join(str(tmp_path), "tokd")
    write_encoded(df, path, n_buckets=2, run_id="r1",
                  chunk_max_rows=128, bloom_columns=["tokens"])
    out = read_encoded_direct(spark, path,
                              contains_filter=("tokens", 4321)).collect()
    assert len(out) == 1 and out[0]["doc_id"] == "d00270"
    assert read_encoded_direct(
        spark, path, contains_filter=("tokens", 10**9)).count() == 0


def test_contains_filter_string_elements(spark, tmp_path):
    schema = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tags", T.ArrayType(T.StringType(), False), False),
    ])
    rows = [Row(doc_id=f"d{i}", tags=[f"tag-{i}-{j}" for j in range(4)])
            for i in range(500)]
    rows[123] = Row(doc_id="d123", tags=["needle", "tag-123-1"])
    df = spark.createDataFrame(rows, schema)
    path = os.path.join(str(tmp_path), "tags")
    write_encoded(df, path, n_buckets=1, run_id="r1",
                  chunk_max_rows=64, bloom_columns=["tags"])
    out = read_encoded(spark, path,
                       contains_filter=("tags", "needle")).collect()
    assert len(out) == 1 and out[0]["doc_id"] == "d123"
    assert read_encoded(
        spark, path, contains_filter=("tags", "absent")).count() == 0


def test_contains_filter_survives_bloomless_runs(spark, tmp_path):
    df = _token_table(spark, n_docs=200)
    path = os.path.join(str(tmp_path), "mix")
    # old run WITHOUT element blooms: chunks must always survive
    write_encoded(df, path, n_buckets=1, run_id="r0", epoch=0,
                  chunk_max_rows=64)
    out = read_encoded(spark, path,
                       contains_filter=("tokens", 100 * 16 + 3)).collect()
    assert len(out) == 1 and out[0]["doc_id"] == "d00100"


def test_contains_filter_composes_with_eq(spark, tmp_path):
    df = _token_table(spark, n_docs=300)
    path = os.path.join(str(tmp_path), "comp")
    write_encoded(df, path, n_buckets=2, run_id="r1",
                  chunk_max_rows=64,
                  bloom_columns=["doc_id", "tokens"])
    # doc d00042 contains token 42*16+7; intersecting filters hit it
    out = read_encoded(spark, path,
                       eq_filter=("doc_id", "d00042"),
                       contains_filter=("tokens", 42 * 16 + 7)).collect()
    assert len(out) == 1
    # right doc, wrong token: the AND yields nothing
    assert read_encoded(spark, path,
                        eq_filter=("doc_id", "d00042"),
                        contains_filter=("tokens", 7)).count() == 0


def test_contains_filter_rejects_non_array(spark, tmp_path):
    df = _token_table(spark, n_docs=50)
    path = os.path.join(str(tmp_path), "bad")
    write_encoded(df, path, n_buckets=1, run_id="r1")
    with pytest.raises(ValueError, match="array column"):
        read_encoded(spark, path,
                     contains_filter=("doc_id", "x")).collect()


def test_contains_filter_any_of_list(spark, tmp_path):
    """Multi-value contains (ANY-of): the banned-token-list scan. A
    chunk survives when its element bloom might contain ANY probe;
    residual arrays_overlap keeps exactness. Covers both readers and
    the absent-probe case inside a list."""
    from tokcodec.io_tables import read_encoded_direct

    df = _token_table(spark, n_docs=1000)
    path = os.path.join(str(tmp_path), "anyof")
    write_encoded(df, path, n_buckets=2, run_id="r1",
                  chunk_max_rows=128, bloom_columns=["tokens"])

    # tokens 800 and 9603 live in docs 50 and 600; 10**9 is absent
    probes = [800, 9603, 10**9]
    for reader in (read_encoded, read_encoded_direct):
        got = sorted(r["doc_id"] for r in reader(
            spark, path, contains_filter=("tokens", probes)).collect())
        assert got == ["d00050", "d00600"], (reader.__name__, got)

    # all-absent list: zero rows; empty list: plan-time error
    assert read_encoded(
        spark, path, contains_filter=("tokens", [10**9, 10**9 + 1])
    ).count() == 0
    with pytest.raises(ValueError, match="non-empty"):
        read_encoded(spark, path, contains_filter=("tokens", [])).collect()

    # ANY-of pruning is real: chunks holding NEITHER probe are pruned
    from tokcodec.bloom import (bloom_might_contain as bmc,
                                bloom_params as bp,
                                element_probe_bytes)

    blocks = spark.read.option("recursiveFileLookup", "true").parquet(
        os.path.join(path, "blocks"))
    blooms = blocks.filter(
        (F.col("column") == "tokens") & (F.col("component") == "bloom")
    ).select("payload").collect()
    pars = [bp(element_probe_bytes(v)) for v in probes]
    hits = sum(any(bmc(bytes(r["payload"]), g1, g2) for g1, g2 in pars)
               for r in blooms)
    assert hits < len(blooms) / 2, (hits, len(blooms))


def test_contains_filter_any_of_strings(spark, tmp_path):
    schema = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tags", T.ArrayType(T.StringType(), False), False),
    ])
    rows = [Row(doc_id=f"d{i}", tags=[f"tag-{i}-{j}" for j in range(3)])
            for i in range(300)]
    df = spark.createDataFrame(rows, schema)
    path = os.path.join(str(tmp_path), "anytags")
    write_encoded(df, path, n_buckets=1, run_id="r1",
                  chunk_max_rows=64, bloom_columns=["tags"])
    got = sorted(r["doc_id"] for r in read_encoded(
        spark, path,
        contains_filter=("tags", ["tag-7-2", "tag-250-0", "absent"])
    ).collect())
    assert got == ["d250", "d7"], got


def test_eq_filter_key_list(spark, tmp_path):
    """Multi-key eq_filter (the removal-list membership probe): a key
    LIST keeps chunks on ANY bloom hit and applies an IN residual —
    both readers, plus the absent-key and empty-list edges."""
    from tokcodec.io_tables import read_encoded_direct

    schema = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("n", T.IntegerType(), False),
    ])
    df = spark.createDataFrame(
        [Row(doc_id=f"doc-{i:05d}", n=i) for i in range(3000)], schema)
    path = os.path.join(str(tmp_path), "keys")
    write_encoded(df, path, n_buckets=2, run_id="r1",
                  chunk_max_rows=256, bloom_columns=["doc_id"])

    keys = ["doc-00042", "doc-02718", "doc-09999"]  # last is absent
    for reader in (read_encoded, read_encoded_direct):
        got = sorted(r["n"] for r in reader(
            spark, path, eq_filter=("doc_id", keys)).collect())
        assert got == [42, 2718], (reader.__name__, got)
    assert read_encoded(
        spark, path, eq_filter=("doc_id", ["nope-1", "nope-2"])
    ).count() == 0
    with pytest.raises(ValueError, match="non-empty"):
        read_encoded(spark, path, eq_filter=("doc_id", [])).collect()


def test_eq_filter_uuid_key_list(spark, tmp_path):
    """Key lists hex-normalize through the uuid lane like single
    keys do."""
    import uuid as uuidlib

    from tokcodec.io_tables import read_encoded_direct  # noqa: F401

    schema = T.StructType([
        T.StructField("uid", T.StringType(), False),
        T.StructField("n", T.IntegerType(), False),
    ])
    ids = [str(uuidlib.UUID(int=i * 7919)) for i in range(500)]
    df = spark.createDataFrame(
        [Row(uid=u, n=i) for i, u in enumerate(ids)], schema)
    path = os.path.join(str(tmp_path), "uuids")
    write_encoded(df, path, n_buckets=1, run_id="r1",
                  chunk_max_rows=64, uuid_columns=["uid"],
                  bloom_columns=["uid"])
    got = sorted(r["n"] for r in read_encoded(
        spark, path, eq_filter=("uid", [ids[3], ids[444]])).collect())
    assert got == [3, 444], got
