"""Per-codec round-trip tests on deterministic arrays — mirrors the
reference's per-type round-trip suites (SURVEY.md §5.1; reference
writer/CarpetWriterTest.java / reader/CarpetReaderTest.java)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tokcodec.codecs.intcodecs import INT_CODECS, decode_ints, encode_ints

EDGE_ARRAYS = {
    "empty": np.zeros(0, dtype=np.int64),
    "single": np.array([42], dtype=np.int64),
    "all_equal": np.full(1000, 7, dtype=np.int64),
    "max_int32": np.full(100, 2**31 - 1, dtype=np.int64),
    "min_int32": np.full(100, -(2**31), dtype=np.int64),
    "increasing": np.arange(5000, dtype=np.int64),
    "decreasing": np.arange(5000, dtype=np.int64)[::-1].copy(),
    "high_card": np.random.default_rng(1).integers(0, 2**31 - 1, 10000).astype(np.int64),
    "zipf_vocab": ((np.random.default_rng(2).zipf(1.1, 20000) - 1) % 50257).astype(np.int64),
    "runs": np.repeat(np.array([3, 1, 4, 1, 5, 9, 2, 6], dtype=np.int64), 997),
    "near_int64": np.array([2**62, 2**62 + 5, 2**62 + 1], dtype=np.int64),
    "negatives": np.array([-5, -5, -5, 0, 3, -(2**40)], dtype=np.int64),
}

NONNEG = {"empty", "single", "all_equal", "max_int32", "increasing", "decreasing",
          "high_card", "zipf_vocab", "runs", "near_int64"}


@pytest.mark.parametrize("codec", list(INT_CODECS))
@pytest.mark.parametrize("name", list(EDGE_ARRAYS))
def test_roundtrip(codec, name):
    v = EDGE_ARRAYS[name]
    if codec == "bitpack" and name not in NONNEG:
        pytest.skip("bitpack requires non-negative")
    payload, meta = encode_ints(v, codec)
    out = decode_ints(payload, codec, meta, len(v))
    np.testing.assert_array_equal(out, v)
    assert out.dtype == np.int64


def test_bitpack_rejects_negative():
    with pytest.raises(ValueError):
        encode_ints(np.array([-1], dtype=np.int64), "bitpack")


def test_compression_actually_happens():
    v = np.full(100_000, 123456, dtype=np.int64)
    for codec in ("rle", "dict", "for"):
        payload, _ = encode_ints(v, codec)
        assert len(payload) < 100_000 * 8 / 50, codec
    sorted_v = np.sort(EDGE_ARRAYS["zipf_vocab"])
    p_delta, _ = encode_ints(sorted_v, "delta")
    p_plain, _ = encode_ints(sorted_v, "plain")
    assert len(p_delta) < len(p_plain) / 3


@given(
    st.lists(st.integers(-(2**60), 2**60), max_size=300),
    st.sampled_from(["plain", "for", "delta", "rle", "dict"]),
)
@settings(max_examples=80, deadline=None)
def test_roundtrip_property(xs, codec):
    v = np.array(xs, dtype=np.int64)
    payload, meta = encode_ints(v, codec)
    np.testing.assert_array_equal(decode_ints(payload, codec, meta, len(v)), v)
