"""FIXTURES.md F2: per-codec micro-fixtures through the full engine —
each fixture's data shape should steer the selector to the intended
codec family AND round-trip bit-identically."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tokcodec import verify_roundtrip
from tokcodec.decode import decode_blocks
from tokcodec.encode import encode_table

RNG = np.random.default_rng(42)


def _df(spark, values, ddl):
    rows = [(i, v) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, f"id bigint, {ddl}")


def _value_codecs(blocks):
    return {
        r.codec
        for r in blocks.filter(
            (F.col("component") == "values") & (F.col("column") == "v")
        ).select("codec").distinct().collect()
    }


def _roundtrip(spark, df):
    blocks = encode_table(df, n_buckets=2).cache()
    dec = decode_blocks(blocks, df.schema)
    assert verify_roundtrip(df, dec, key="id")["ok"]
    return blocks


def test_dict_col(spark):
    vals = [f"val{i % 8}" for i in range(10_000)]
    blocks = _roundtrip(spark, _df(spark, vals, "v string"))
    assert _value_codecs(blocks) == {"dict_str"}


def test_rle_col(spark):
    vals = np.repeat(np.arange(20), RNG.integers(1, 1000, 20)).astype(int).tolist()
    blocks = _roundtrip(spark, _df(spark, vals, "v int"))
    # per-bucket shuffling breaks global runs; RLE or a cheaper
    # width-based codec may win — but must beat plain
    assert "plain" not in _value_codecs(blocks)


def test_bitpack_col(spark):
    for k in (1, 4, 7, 12, 20, 31):
        vals = RNG.integers(0, 2**k, 2000).astype(int).tolist()
        blocks = _roundtrip(spark, _df(spark, vals, "v int"))
        allowed = {"bitpack", "for", "dict", "rle"}
        if k == 31:
            # width snaps to 32 == plain int32; plain is optimal there
            allowed.add("plain")
        assert _value_codecs(blocks) <= allowed, k


def test_for_col(spark):
    base = 1_900_000_000
    vals = (RNG.integers(0, 2**12, 5000) + base).astype(int).tolist()
    blocks = _roundtrip(spark, _df(spark, vals, "v int"))
    assert _value_codecs(blocks) <= {"for", "dict"}


def test_fsst_col(spark):
    vals = [
        f"https://example.com/products/category-{i % 50}/item?id={i}&ref=home"
        for i in range(8000)
    ]
    blocks = _roundtrip(spark, _df(spark, vals, "v string"))
    # structured strings: fsst or plain+zstd, whichever measured smaller
    assert _value_codecs(blocks) <= {"fsst", "plain_str", "dict_str"}


def test_null_col(spark):
    vals = [None if RNG.random() < 0.3 else int(x)
            for x in RNG.integers(0, 1000, 5000)]
    df = _df(spark, vals, "v int")
    blocks = _roundtrip(spark, df)
    comps = {r.component for r in blocks.filter(F.col("column") == "v")
             .select("component").distinct().collect()}
    assert "validity" in comps


def test_empty_part(spark):
    df = _df(spark, [], "v int")
    blocks = encode_table(df, n_buckets=2)
    dec = decode_blocks(blocks, df.schema)
    assert dec.count() == 0