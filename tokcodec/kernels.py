"""Vectorized bit-level primitives shared by all codecs.

Everything here operates on whole numpy arrays — no per-element Python.
This is the layer the reference delegates to parquet-java for
(dictionary/RLE/bit-pack encodings are chosen per column chunk by
parquet's writer; see reference CarpetWriter.java:335-385 for the knobs
Carpet exposes). We implement the primitives from scratch per the
north rule.
"""

from __future__ import annotations

import numpy as np

_U64_ONE = np.uint64(1)
_U64_63 = np.uint64(63)

# Slice size for chunked (memory-bounded) bit packing. Each slice
# materializes an (n, width) uint8 matrix; 1M values * 64 bits = 64MB max.
_SLICE = 1 << 20


def bits_needed(max_value: int) -> int:
    """Number of bits to represent unsigned ``max_value`` (0 -> 0 bits)."""
    if max_value < 0:
        raise ValueError("bits_needed expects unsigned values")
    return int(max_value).bit_length()


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack unsigned ``values`` (any int dtype, all < 2**width) into a
    dense big-endian-bit buffer of ``width`` bits per value."""
    n = len(values)
    if width == 0 or n == 0:
        return b""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    # byte-aligned fast paths
    if width == 8:
        return v.astype(np.uint8).tobytes()
    if width == 16:
        return v.astype(np.uint16).tobytes()
    if width == 32:
        return v.astype(np.uint32).tobytes()
    if width == 64:
        return v.tobytes()
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    out = bytearray()
    # pack in slices so the intermediate bit matrix stays bounded;
    # slice boundary is a multiple of 8 values so bytes concatenate cleanly
    step = max(8, (_SLICE // max(width, 1)) & ~7)
    for lo in range(0, n, step):
        sl = v[lo : lo + step]
        bits = ((sl[:, None] >> shifts) & _U64_ONE).astype(np.uint8)
        out += np.packbits(bits.ravel()).tobytes()
    return bytes(out)


def unpack_bits(buf: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns uint64 array of length n."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    if width == 8:
        return np.frombuffer(buf, dtype=np.uint8, count=n).astype(np.uint64)
    if width == 16:
        return np.frombuffer(buf, dtype=np.uint16, count=n).astype(np.uint64)
    if width == 32:
        return np.frombuffer(buf, dtype=np.uint32, count=n).astype(np.uint64)
    if width == 64:
        return np.frombuffer(buf, dtype=np.uint64, count=n).copy()
    raw = np.frombuffer(buf, dtype=np.uint8)
    out = np.empty(n, dtype=np.uint64)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    step = max(8, (_SLICE // max(width, 1)) & ~7)
    for lo in range(0, n, step):
        hi = min(lo + step, n)
        # byte range covering values [lo, hi): lo is a multiple of 8 values
        b0 = lo * width // 8
        b1 = (hi * width + 7) // 8
        bits = np.unpackbits(raw[b0:b1], count=(hi - lo) * width)
        bits = bits.reshape(hi - lo, width).astype(np.uint64)
        out[lo:hi] = (bits << shifts).sum(axis=1)
    return out


def zigzag_encode(values: np.ndarray) -> np.ndarray:
    """int64 -> uint64 zigzag (small magnitudes -> small codes)."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    uv = v.view(np.uint64)
    sign = np.where(v < 0, np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64(0))
    return ((uv << _U64_ONE) ^ sign).astype(np.uint64)


def zigzag_decode(codes: np.ndarray) -> np.ndarray:
    """uint64 zigzag -> int64."""
    z = np.ascontiguousarray(codes, dtype=np.uint64)
    half = (z >> _U64_ONE).view(np.int64)
    neg = (z & _U64_ONE).view(np.int64)
    return half ^ -neg


def run_ends(values: np.ndarray) -> np.ndarray:
    """Indices where each run ends (exclusive); len == number of runs."""
    if len(values) == 0:
        return np.zeros(0, dtype=np.int64)
    change = np.flatnonzero(values[1:] != values[:-1]) + 1
    return np.concatenate([change, [len(values)]]).astype(np.int64)


def pack_frames(payloads: list[bytes]) -> bytes:
    """Concatenate child payloads with u32 count + u64 length headers."""
    head = np.array([len(payloads)], dtype=np.uint32).tobytes()
    lens = np.array([len(p) for p in payloads], dtype=np.uint64).tobytes()
    return head + lens + b"".join(payloads)


def unpack_frames(buf: bytes) -> list[bytes]:
    """Inverse of :func:`pack_frames`."""
    k = int(np.frombuffer(buf[:4], dtype=np.uint32)[0])
    lens = np.frombuffer(buf[4 : 4 + 8 * k], dtype=np.uint64).astype(np.int64)
    out = []
    off = 4 + 8 * k
    for ln in lens:
        out.append(buf[off : off + int(ln)])
        off += int(ln)
    return out
