"""Real media formats (round-3 verdict #5): binary PPM / RIFF-WAV /
framed-RGB payloads synthesized from doc_id, decoded by genuine
container parsing — and their closed-form sums, which is what lets
the driver oracle check the whole binary round-trip."""

import numpy as np
import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from tokcodec import verify_roundtrip
from tokcodec.decode import decode_blocks
from tokcodec.encode import encode_table
from tokcodec.multimodal import decode_media, synth_media_real


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=i) for i in range(120)],
        T.StructType([T.StructField("doc_id", T.LongType(), False)]))


@pytest.fixture(scope="module")
def media(spark, docs):
    return synth_media_real(docs).cache()


def test_payloads_are_real_containers(spark, media):
    rows = {r.doc_id: r for r in media.collect()}
    img = rows["m00000000"].media          # doc 0 -> image
    assert img.startswith(b"P6\n")
    w, h = map(int, img[3:img.index(b"\n", 3)].split())
    assert (w, h) == (16, 16) and len(img) > w * h * 3
    wav = rows["m00000001"].media          # doc 1 -> audio
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    assert b"fmt " in wav and b"data" in wav
    vid = rows["m00000002"].media          # doc 2 -> video
    assert vid[:4] == b"TVID"


def test_decode_matches_closed_form(spark, media):
    got = {r.doc_id: r for r in decode_media(media).collect()}
    for i in range(120):
        r = got[f"m{i:08d}"]
        k = i % 3
        if k == 0:
            want = 97920 * (1 + i % 3) * (1 + i % 5)
            assert (r.kind, r.value_sum) == ("image", want), (i, r)
            assert r.units == 768 * (1 + i % 3) * (1 + i % 5)
        elif k == 1:
            assert (r.kind, r.value_sum) == ("audio", 32640 * (1 + i % 4))
            assert r.units == 256 * (1 + i % 4)
        else:
            want = 97920 * (1 + i % 2) * (1 + i % 2) * (1 + i % 3)
            assert (r.kind, r.value_sum) == ("video", want), (i, r)


def test_engine_roundtrip_bit_identical(spark, media):
    blocks = encode_table(media, n_buckets=3)
    dec = decode_blocks(blocks, media.schema)
    res = verify_roundtrip(media, dec, key="doc_id")
    assert res["ok"] and res["rows"] == 120
    # decode of the ROUND-TRIPPED payloads still matches closed form
    one = decode_media(dec).filter(F.col("doc_id") == "m00000003").collect()[0]
    assert one.kind == "image" and one.value_sum == 97920 * (1 + 3 % 3) * (1 + 3 % 5)


def test_decode_rejects_unknown_container(spark):
    df = spark.createDataFrame(
        [Row(doc_id="x", media=b"JUNKDATA")],
        "doc_id string, media binary")
    with pytest.raises(Exception, match="unknown media container"):
        decode_media(df).collect()


def test_wav_sum_against_numpy(spark, media):
    """Independent recomputation: parse doc 7's WAV with numpy here
    and compare against the distributed decode."""
    wav = media.filter(F.col("doc_id") == "m00000007").collect()[0].media
    data_off = wav.index(b"data") + 8
    samples = np.frombuffer(wav, "<i2", offset=data_off)
    got = decode_media(
        media.filter(F.col("doc_id") == "m00000007")).collect()[0]
    assert got.value_sum == int(samples.astype(np.int64).sum())
    assert got.units == samples.size


def test_decode_batch_loop_zero_copy():
    """r4 verdict #4: the decode batch loop must not copy full payloads
    into Python bytes per row — bodies come from numpy slices of the
    shared Arrow data buffer; only the container header (<=64 bytes) is
    materialized per item."""
    import inspect
    from tokcodec import multimodal
    src = inspect.getsource(multimodal.decode_media)
    assert ".as_py(" not in src, "per-row payload copy crept back in"
