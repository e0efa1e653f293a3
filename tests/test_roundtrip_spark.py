"""End-to-end Spark encode -> blocks -> decode round-trip.

Mirrors the reference's writer/reader record-equality methodology
(SURVEY.md §5.1-5.2): the decoded DataFrame must equal the original
bit-identically, with DuckDB-independent verification done by the
driver harness at sf0.01."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tokcodec import verify_roundtrip
from tokcodec.decode import decode_blocks
from tokcodec.encode import encode_table
from tokcodec.synth import synth_df


@pytest.fixture(scope="module")
def seq_df(spark):
    return synth_df(spark, 10_000, seed=42, partitions=8).cache()


def test_roundtrip_bit_identical(spark, seq_df):
    blocks = encode_table(seq_df, n_buckets=16)
    decoded = decode_blocks(blocks, seq_df.schema)
    res = verify_roundtrip(seq_df, decoded)
    assert res["ok"], res
    assert res["rows"] == 10_000


def test_schema_preserved(spark, seq_df):
    blocks = encode_table(seq_df, n_buckets=8)
    decoded = decode_blocks(blocks, seq_df.schema)
    assert decoded.schema == seq_df.schema


def test_projection_decodes_subset(spark, seq_df):
    blocks = encode_table(seq_df, n_buckets=8).cache()
    dec = decode_blocks(blocks, seq_df.schema, columns=["doc_id", "n_tok"])
    assert dec.columns == ["doc_id", "n_tok"]
    orig = seq_df.select("doc_id", "n_tok")
    res = verify_roundtrip(orig, dec)
    assert res["ok"], res
    # missing column fails like the reference's validateMissingColumn
    with pytest.raises(ValueError):
        decode_blocks(blocks, seq_df.schema, columns=["nope"])
    blocks.unpersist()


def test_compression_beats_raw(spark, seq_df):
    blocks = encode_table(seq_df, n_buckets=8)
    agg = (
        blocks.filter(F.col("component") != "metrics")
        .agg(F.sum("orig_bytes").alias("o"), F.sum("enc_bytes").alias("e"))
        .collect()[0]
    )
    assert agg.e < 0.8 * agg.o, (agg.e, agg.o)


def test_codec_diversity(spark, seq_df):
    blocks = encode_table(seq_df, n_buckets=8)
    codecs = {
        r.codec
        for r in blocks.filter(F.col("component") == "values")
        .select("codec").distinct().collect()
    }
    # the selector should be exercising several codecs on this mix
    assert len(codecs) >= 3, codecs


def test_nulls_roundtrip(spark):
    pdf = spark.createDataFrame(
        [(i, None if i % 3 == 0 else i * 7, None if i % 5 == 0 else f"s{i % 4}")
         for i in range(1000)],
        "id bigint, v bigint, s string",
    )
    blocks = encode_table(pdf, n_buckets=4)
    dec = decode_blocks(blocks, pdf.schema)
    res = verify_roundtrip(pdf, dec, key="id")
    assert res["ok"], res


def test_empty_input(spark, seq_df):
    empty = seq_df.filter(F.lit(False))
    blocks = encode_table(empty, n_buckets=4)
    dec = decode_blocks(blocks, empty.schema)
    assert dec.count() == 0


def test_skewed_giant_rows_chunking(spark):
    # one giant doc among small ones: chunk caps must split it cleanly
    rows = [("big", list(range(200_000)), 200_000, "web")] + [
        (f"d{i}", [i, i + 1], 2, "web") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>, n_tok int, source string")
    blocks = encode_table(df, n_buckets=2)
    dec = decode_blocks(blocks, df.schema)
    res = verify_roundtrip(df, dec)
    assert res["ok"], res
