"""Per-column codec override (round-3 verdict #7; reference C1
per-column encoding knobs, CarpetWriter.java:335-374): the caller can
pin a column's leaf codec; the override wins over the auto-selector,
round-trips, is lane-validated at plan time, and shows up in lineage.
"""

import json

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from tokcodec.encode import validate_codec_override
from tokcodec.io_tables import read_encoded, write_encoded

SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
    T.StructField("n_tok", T.IntegerType(), False),
    T.StructField("source", T.StringType(), False),
    T.StructField("score", T.DoubleType(), False),
])


def _mk(spark, n=300):
    # source has 3 distinct values -> the selector would pick dict_str;
    # n_tok is a small-range int -> selector picks bitpack/for
    return spark.createDataFrame(
        [Row(doc_id=f"d{i:05d}", tokens=[i % 7, i % 11], n_tok=2,
             source=f"s{i % 3}", score=float(i) / 3) for i in range(n)],
        SCHEMA)


def _codecs(spark, path, col):
    lin = spark.read.parquet(f"{path}/lineage")
    return sorted({json.loads(r.codecs).get(col)
                   for r in lin.select("codecs").collect()} - {None})


def test_override_wins_and_roundtrips(spark, tmp_path):
    df = _mk(spark)
    base, forced = str(tmp_path / "auto"), str(tmp_path / "forced")
    write_encoded(df, base, n_buckets=2, run_id="a")
    write_encoded(df, forced, n_buckets=2, run_id="f",
                  codec_override={"source": "plain_str",
                                  "n_tok": "plain",
                                  "tokens": "rle",
                                  "score": "split"})
    assert _codecs(spark, base, "source") == ["dict_str"]
    assert _codecs(spark, forced, "source") == ["plain_str"]
    assert _codecs(spark, forced, "n_tok") == ["plain"]
    assert _codecs(spark, forced, "tokens") == ["rle"]
    got = {r.doc_id: (r.tokens, r.n_tok, r.source, r.score)
           for r in read_encoded(spark, forced).collect()}
    want = {r.doc_id: (r.tokens, r.n_tok, r.source, r.score)
            for r in df.collect()}
    assert got == want


def test_override_validation():
    ov_err = [
        ({"nope": "plain"}, "not in schema"),
        ({"n_tok": "dict_str"}, "not a int-lane"),
        ({"source": "rle"}, "not a str-lane"),
        ({"score": "plain"}, "not a float-lane"),
    ]
    for ov, msg in ov_err:
        with pytest.raises(ValueError, match=msg):
            validate_codec_override(SCHEMA, ov)
    validate_codec_override(SCHEMA, {"tokens": "delta"})  # list leaf ok
    validate_codec_override(SCHEMA, None)


def test_bitpack_override_rejects_negatives(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(doc_id="a", v=-5), Row(doc_id="b", v=3)],
        "doc_id string, v int")
    with pytest.raises(Exception, match="bitpack.*non-negative"):
        write_encoded(df, str(tmp_path / "t"), n_buckets=1, run_id="r",
                      codec_override={"v": "bitpack"})


def test_struct_override_rejected(spark):
    sch = T.StructType([
        T.StructField("s", T.StructType([
            T.StructField("a", T.IntegerType(), True),
            T.StructField("b", T.StringType(), True)]), True)])
    with pytest.raises(ValueError, match="ambiguous"):
        validate_codec_override(sch, {"s": "plain"})
