import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from tokcodec.codecs.fsst import (
    SymbolTable,
    fsst_compress,
    fsst_decode,
    fsst_decompress,
    fsst_encode,
    train_table,
)
from tokcodec.codecs.strcodecs import arrow_to_strchunk, strchunk_to_arrow


def _chunk(strings):
    return arrow_to_strchunk(pa.array(strings, pa.string()))


def _roundtrip(strings):
    data, lengths = _chunk(strings)
    payload, meta = fsst_encode(data, lengths)
    d2, l2 = fsst_decode(payload, meta, len(lengths))
    assert strchunk_to_arrow(d2, l2).to_pylist() == strings
    return payload, data


def test_empty():
    _roundtrip([])
    _roundtrip(["", "", ""])


def test_basic():
    _roundtrip(["hello world", "hello there", "world of hello"])


def test_doc_ids_compress():
    strings = [f"web-{i:010d}-{(i * 2654435761) % 2**32:08x}" for i in range(20000)]
    payload, data = _roundtrip(strings)
    # shared structure should compress well below raw utf8 size
    assert len(payload) < 0.7 * len(data)


def test_urls_compress():
    strings = [
        f"https://example.com/products/category-{i % 50}/item?id={i}&ref=homepage"
        for i in range(5000)
    ]
    payload, data = _roundtrip(strings)
    assert len(payload) < 0.55 * len(data)


def test_binary_ish_bytes_with_escape_values():
    # strings containing byte 255 in utf8 (multi-byte chars) and rare bytes
    strings = ["ÿþ" * 10, "ÿÿÿ", "abcÿ", ""]
    _roundtrip(strings * 100)


def test_long_string_segments():
    # > SEG_CAP forces segment splitting
    strings = ["abcdefgh" * 2000, "x" * 5000, "short"]
    _roundtrip(strings)


def test_symbol_table_serialization():
    t = SymbolTable([b"a", b"bc", b"hello", b"\xff\x00"])
    symdata, lens = t.serialize()
    t2 = SymbolTable.deserialize(symdata, lens)
    assert t2.symbols == t.symbols


def test_compress_decompress_direct():
    corpus = b"the quick brown fox jumps over the lazy dog " * 100
    buf = np.frombuffer(corpus, dtype=np.uint8)
    ends = np.array([len(buf)], dtype=np.int64)
    table = train_table(buf, ends)
    codes, lits = fsst_compress(buf, ends, table)
    assert fsst_decompress(codes, lits, table) == corpus
    assert len(codes) + len(lits) < 0.5 * len(corpus)


@given(st.lists(st.text(max_size=80), max_size=60))
@settings(max_examples=40, deadline=None)
def test_roundtrip_property(strings):
    _roundtrip(strings)
