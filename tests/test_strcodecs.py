import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from tokcodec.codecs.strcodecs import (
    STR_CODECS,
    arrow_to_strchunk,
    strchunk_to_arrow,
)

CASES = {
    "empty": [],
    "one": ["hello"],
    "empties": ["", "", ""],
    "low_card": ["web", "books", "web", "web", "code"] * 2000,
    "doc_ids": [f"web-{i:010d}-{(i * 2654435761) % 2**32:08x}" for i in range(5000)],
    "unicode": ["héllo wörld", "日本語テキスト", "emoji 🎉🎊", ""],
    "long": ["x" * 10000, "ab" * 5000],
}


def _as_arrow(strings):
    return pa.array(strings, pa.string())


@pytest.mark.parametrize("codec", list(STR_CODECS))
@pytest.mark.parametrize("case", list(CASES))
def test_roundtrip(codec, case):
    arr = _as_arrow(CASES[case])
    data, lengths = arrow_to_strchunk(arr)
    enc, dec = STR_CODECS[codec]
    payload, meta = enc(data, lengths)
    d2, l2 = dec(payload, meta, len(lengths))
    out = strchunk_to_arrow(d2, l2)
    assert out.to_pylist() == CASES[case]


def test_strchunk_conversion_identity():
    arr = _as_arrow(CASES["unicode"])
    data, lengths = arrow_to_strchunk(arr)
    assert strchunk_to_arrow(data, lengths).to_pylist() == CASES["unicode"]


def test_strchunk_handles_sliced_array():
    arr = _as_arrow(["aa", "bb", "cc", "dd"]).slice(1, 2)
    data, lengths = arrow_to_strchunk(arr)
    assert strchunk_to_arrow(data, lengths).to_pylist() == ["bb", "cc"]


def test_dict_compresses_low_card():
    arr = _as_arrow(CASES["low_card"])
    data, lengths = arrow_to_strchunk(arr)
    payload, _ = STR_CODECS["dict_str"][0](data, lengths)
    assert len(payload) < len(data) / 5


@given(st.lists(st.text(max_size=50), max_size=100))
@settings(max_examples=50, deadline=None)
def test_roundtrip_property(strings):
    arr = _as_arrow(strings)
    data, lengths = arrow_to_strchunk(arr)
    for codec in ("plain_str", "dict_str"):
        enc, dec = STR_CODECS[codec]
        payload, meta = enc(data, lengths)
        d2, l2 = dec(payload, meta, len(lengths))
        assert strchunk_to_arrow(d2, l2).to_pylist() == strings
