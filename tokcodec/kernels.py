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


def safe_offsets32(lengths: np.ndarray) -> np.ndarray:
    """Lengths -> int32 Arrow offsets, computed in int64 so an
    overflowing total is a clear error instead of silent wraparound
    (Arrow string/list arrays carry int32 offsets; a decode group whose
    flattened payload exceeds 2^31-1 values/bytes needs more buckets or
    smaller chunks)."""
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    if len(offsets) and offsets[-1] > np.iinfo(np.int32).max:
        raise ValueError(
            f"offsets exceed int32: {int(offsets[-1])} flattened values in "
            "one decode group — raise n_buckets or lower chunk_max_values"
        )
    return offsets.astype(np.int32)


# Supported pack widths. Arbitrary-bit packing via a bit matrix creates
# up to 64x temporaries and saturates memory bandwidth at 32 cores
# (measured: 8->32 procs gave only 1.46x); snapping to these widths
# keeps every pack/unpack a cheap byte-lane copy. The <=5% size loss is
# recovered by the zstd outer layer.
#   1..7   bit matrix in uint8 lanes (temp = n*width bytes, small)
#   8k     truncate little-endian uint64 lanes (zero-copy-ish)
#   12/20/28  combine value pairs into 3/5/7-byte groups
_PAIR_BYTES = {12: 3, 20: 5, 28: 7}


def snap_width(w: int) -> int:
    """Smallest supported pack width >= w."""
    if w <= 8:
        return w
    if w <= 12:
        return 12
    if w <= 20 and w % 8 == 0:
        return w
    if w <= 16:
        return 16
    if w <= 20:
        return 20
    if w <= 24:
        return 24
    if w <= 28:
        return 28
    return ((w + 7) // 8) * 8


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack unsigned ``values`` into a dense buffer; ``width`` must be
    a supported (snapped) width. Accepts any unsigned-valued integer
    array (uint8..uint64 / non-negative int); lanes are taken from the
    value's own dtype when wide enough — no upcast pass."""
    n = len(values)
    if width == 0 or n == 0:
        return b""
    v = np.ascontiguousarray(values)
    item = v.dtype.itemsize
    if width % 8 == 0:
        k = width // 8
        if k == item:
            return v.tobytes()
        if k < item:
            lanes = v.view(np.uint8).reshape(n, item)[:, :k]  # little-endian
            return np.ascontiguousarray(lanes).tobytes()
        # width wider than dtype: zero-extend through uint64
        return np.ascontiguousarray(
            v.astype(np.uint64).view(np.uint8).reshape(n, 8)[:, :k]
        ).tobytes()
    if width in _PAIR_BYTES:
        # combine value pairs into 2*width-bit groups
        wdt = np.uint32 if width <= 16 else np.uint64
        a = v[0::2].astype(wdt, copy=False)
        b = v[1::2].astype(wdt, copy=False)
        if len(b) < len(a):
            b = np.concatenate([b, np.zeros(1, dtype=wdt)])
        pairs = (a.astype(wdt) | (b.astype(wdt) << wdt(width)))
        k = _PAIR_BYTES[width]
        lanes = pairs.view(np.uint8).reshape(len(pairs), pairs.dtype.itemsize)[:, :k]
        return np.ascontiguousarray(lanes).tobytes()
    if width <= 7:
        v8 = v.astype(np.uint8)
        shifts = np.arange(width - 1, -1, -1, dtype=np.uint8)
        bits = (v8[:, None] >> shifts) & np.uint8(1)
        return np.packbits(bits.ravel()).tobytes()
    raise ValueError(f"unsupported pack width {width}")


def unpack_bits(buf: bytes, width: int, n: int,
                out_dtype=np.uint64) -> np.ndarray:
    """Inverse of :func:`pack_bits`. ``out_dtype`` lets decode stay in
    narrow lanes (uint32 for int32 columns) — half the write traffic."""
    out_dtype = np.dtype(out_dtype)
    if width > out_dtype.itemsize * 8:
        out_dtype = np.dtype(np.uint64)
    if width == 0 or n == 0:
        return np.zeros(n, dtype=out_dtype)
    item = out_dtype.itemsize
    if width % 8 == 0:
        k = width // 8
        if k == item:
            return np.frombuffer(buf, dtype=out_dtype, count=n).copy()
        full = np.zeros((n, item), dtype=np.uint8)
        full[:, :k] = np.frombuffer(buf, dtype=np.uint8, count=n * k).reshape(n, k)
        return full.reshape(-1).view(out_dtype)
    if width in _PAIR_BYTES:
        k = _PAIR_BYTES[width]
        m = (n + 1) // 2
        wdt = np.dtype(np.uint32 if width <= 16 else np.uint64)
        full = np.zeros((m, wdt.itemsize), dtype=np.uint8)
        full[:, :k] = np.frombuffer(buf, dtype=np.uint8, count=m * k).reshape(m, k)
        pairs = full.reshape(-1).view(wdt)
        out = np.empty(2 * m, dtype=wdt)
        mask = wdt.type((1 << width) - 1)
        out[0::2] = pairs & mask
        out[1::2] = pairs >> wdt.type(width)
        return out[:n].astype(out_dtype, copy=False)
    if width <= 7:
        raw = np.frombuffer(buf, dtype=np.uint8)
        bits = np.unpackbits(raw, count=n * width).reshape(n, width)
        shifts = np.arange(width - 1, -1, -1, dtype=np.uint8)
        return (bits << shifts).sum(axis=1, dtype=np.uint8).astype(out_dtype)
    raise ValueError(f"unsupported pack width {width}")


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
