"""Multimodal binary columns: engine round-trip of opaque payloads +
typed metadata, and the stubbed feature-extraction plumbing."""

import pytest
from pyspark.sql import functions as F

from tokcodec import verify_roundtrip
from tokcodec.decode import decode_blocks
from tokcodec.encode import encode_table
from tokcodec.multimodal import FEATURE_DIM, extract_features, synth_media


@pytest.fixture(scope="module")
def media_df(spark):
    return synth_media(spark, 1000, seed=5).cache()


def test_binary_roundtrip_bit_identical(spark, media_df):
    blocks = encode_table(media_df, n_buckets=4)
    dec = decode_blocks(blocks, media_df.schema)
    res = verify_roundtrip(media_df, dec, key="doc_id")
    assert res["ok"], res
    assert res["rows"] == 1000


def test_feature_extraction_shapes(spark, media_df):
    feats = extract_features(media_df)
    rows = feats.collect()
    assert len(rows) == 1000
    assert all(len(r.feature) == FEATURE_DIM for r in rows[:20])
    # histogram features are normalized
    s = sum(rows[0].feature)
    assert abs(s - 1.0) < 1e-3


def test_feature_extraction_deterministic(spark, media_df):
    a = extract_features(media_df).orderBy("doc_id").limit(5).collect()
    b = extract_features(media_df).orderBy("doc_id").limit(5).collect()
    assert [r.feature for r in a] == [r.feature for r in b]


def test_decode_stub_raises(spark, media_df):
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        extract_features(media_df, decode_stub="raise").collect()


def test_binary_nulls(spark):
    df = spark.createDataFrame(
        [("a", b"\x00\xff\x10"), ("b", None), ("c", b"")],
        "id string, blob binary",
    )
    blocks = encode_table(df, n_buckets=2)
    dec = decode_blocks(blocks, df.schema)
    assert verify_roundtrip(df, dec, key="id")["ok"]