import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tokcodec.kernels import (
    bits_needed,
    pack_bits,
    pack_frames,
    run_ends,
    unpack_bits,
    unpack_frames,
    zigzag_decode,
    zigzag_encode,
)


SUPPORTED = [1, 2, 3, 4, 5, 6, 7, 8, 12, 16, 20, 24, 28, 32, 40, 48, 56, 64]


@pytest.mark.parametrize("width", SUPPORTED)
def test_pack_unpack_roundtrip(width):
    rng = np.random.default_rng(7)
    hi = (1 << width) - 1
    v = rng.integers(0, hi, size=10_001, dtype=np.uint64, endpoint=True)
    buf = pack_bits(v, width)
    out = unpack_bits(buf, width, len(v))
    np.testing.assert_array_equal(v, out)


def test_snap_width_covers_all():
    from tokcodec.kernels import snap_width

    for w in range(0, 65):
        s = snap_width(w)
        assert s >= w and s in ([0] + SUPPORTED), (w, s)
    # snapping waste is bounded
    assert snap_width(9) == 12 and snap_width(13) == 16
    assert snap_width(17) == 20 and snap_width(25) == 28
    assert snap_width(31) == 32 and snap_width(33) == 40


@pytest.mark.parametrize("width", SUPPORTED)
def test_pack_roundtrip_odd_lengths(width):
    # pair-combined widths pad odd lengths; verify all small n
    rng = np.random.default_rng(3)
    for n in (0, 1, 2, 3, 7):
        v = rng.integers(0, (1 << width) - 1, size=n, dtype=np.uint64,
                         endpoint=True)
        np.testing.assert_array_equal(
            unpack_bits(pack_bits(v, width), width, n), v
        )


def test_pack_empty_and_zero_width():
    assert pack_bits(np.zeros(0, np.uint64), 5) == b""
    assert pack_bits(np.zeros(4, np.uint64), 0) == b""
    np.testing.assert_array_equal(unpack_bits(b"", 0, 4), np.zeros(4, np.uint64))


def test_pack_crosses_slice_boundary():
    # force multiple internal slices at an odd width
    v = np.arange(3_000_000, dtype=np.uint64) % 31
    buf = pack_bits(v, 5)
    np.testing.assert_array_equal(unpack_bits(buf, 5, len(v)), v)


@given(st.lists(st.integers(-(2**62), 2**62), max_size=200))
@settings(max_examples=50, deadline=None)
def test_zigzag_roundtrip(xs):
    v = np.array(xs, dtype=np.int64)
    np.testing.assert_array_equal(zigzag_decode(zigzag_encode(v)), v)


def test_bits_needed():
    assert bits_needed(0) == 0
    assert bits_needed(1) == 1
    assert bits_needed(255) == 8
    assert bits_needed(256) == 9
    assert bits_needed(2**31 - 1) == 31


def test_run_ends():
    v = np.array([5, 5, 5, 2, 2, 9])
    np.testing.assert_array_equal(run_ends(v), [3, 5, 6])
    assert len(run_ends(np.zeros(0, np.int64))) == 0


def test_frames():
    parts = [b"", b"abc", b"\x00" * 1000]
    assert unpack_frames(pack_frames(parts)) == parts
