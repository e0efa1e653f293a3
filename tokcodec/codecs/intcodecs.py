"""Integer column codecs: plain / bitpack / FOR / delta / RLE / dict.

Each codec is an ``(encode, decode)`` pair over a whole numpy int array
(one column chunk = one Spark partition-bucket x column). ``encode``
returns ``(payload: bytes, meta: dict)``; ``decode(payload, codec,
meta, n, out_dtype)`` returns a numpy array in ``out_dtype``.

Hot paths (bitpack / FOR on int32 token streams) stay in 32-bit lanes
end to end — no int64 upcast pass — because at 32 cores the encoder is
memory-bandwidth-bound, not ALU-bound (measured; see kernels.py note).

Semantics mirror what the reference delegates to parquet-java per
column chunk (dictionary-aware decode: reference
impl/read/converter/StringConverter.java:39-55 materializes the dict
once then maps indices; our dict decode is the same ``take``), built
from scratch per BASELINE.json north_rule.
"""

from __future__ import annotations

import numpy as np

from tokcodec.kernels import (
    bits_needed,
    pack_bits,
    pack_frames,
    run_ends,
    snap_width,
    unpack_bits,
    unpack_frames,
    zigzag_decode,
    zigzag_encode,
)

_I32_MAX = 2**31 - 1


def _as_i64(values) -> np.ndarray:
    return np.ascontiguousarray(values, dtype=np.int64)


def _unsigned_view(v: np.ndarray) -> np.ndarray:
    return v.view(np.dtype(f"u{v.dtype.itemsize}"))


# ---------------------------------------------------------------- plain
def plain_encode(values: np.ndarray) -> tuple[bytes, dict]:
    v = np.ascontiguousarray(values)
    return v.tobytes(), {"dtype": v.dtype.str}


def plain_decode(payload: bytes, meta: dict, n: int, out_dtype=np.int64) -> np.ndarray:
    raw = np.frombuffer(payload, dtype=np.dtype(meta["dtype"]), count=n)
    return raw.astype(out_dtype, copy=False)


# -------------------------------------------------------------- bitpack
def bitpack_encode(values: np.ndarray) -> tuple[bytes, dict]:
    """Unsigned bit-packing; requires min >= 0 (use FOR otherwise).
    Packs straight from the value's own lanes — no upcast."""
    v = np.ascontiguousarray(values)
    if len(v) == 0:
        return b"", {"width": 0}
    if int(v.min()) < 0:
        raise ValueError("bitpack requires non-negative values; use 'for'")
    w = snap_width(bits_needed(int(v.max())))
    return pack_bits(_unsigned_view(v), w), {"width": w}


def bitpack_decode(payload: bytes, meta: dict, n: int, out_dtype=np.int64) -> np.ndarray:
    out_dtype = np.dtype(out_dtype)
    u = unpack_bits(payload, meta["width"], n,
                    out_dtype=np.dtype(f"u{out_dtype.itemsize}"))
    return u.view(out_dtype) if meta["width"] < out_dtype.itemsize * 8 \
        else u.astype(out_dtype, copy=False).view(out_dtype)


# ------------------------------------------------- frame-of-reference
def for_encode(values: np.ndarray) -> tuple[bytes, dict]:
    v = np.ascontiguousarray(values)
    if len(v) == 0:
        return b"", {"ref": 0, "width": 0}
    ref = int(v.min())
    rng = int(v.max()) - ref
    if rng <= _I32_MAX and v.dtype.itemsize <= 4:
        shifted = _unsigned_view(v - v.dtype.type(ref))
    else:
        shifted = (_as_i64(v) - np.int64(ref)).view(np.uint64)
    w = snap_width(bits_needed(rng))
    return pack_bits(shifted, w), {"ref": ref, "width": w}


def for_decode(payload: bytes, meta: dict, n: int, out_dtype=np.int64) -> np.ndarray:
    out_dtype = np.dtype(out_dtype)
    ref = meta["ref"]
    hi = ref + ((1 << meta["width"]) - 1)
    if (out_dtype.itemsize < 8 and
            (ref < -(2 ** (out_dtype.itemsize * 8 - 1)) or
             hi > 2 ** (out_dtype.itemsize * 8 - 1) - 1)):
        out_dtype = np.dtype(np.int64)  # range wouldn't fit the target
    u = unpack_bits(payload, meta["width"], n,
                    out_dtype=np.dtype(f"u{out_dtype.itemsize}"))
    return u.view(out_dtype) + out_dtype.type(ref)


# ---------------------------------------------------------------- delta
def delta_encode(values: np.ndarray) -> tuple[bytes, dict]:
    """first value + zigzag(bit-packed) deltas; wins on sorted data."""
    v = _as_i64(values)
    if len(v) == 0:
        return b"", {"first": 0, "width": 0}
    d = np.diff(v)
    zz = zigzag_encode(d)
    w = snap_width(bits_needed(int(zz.max()))) if len(zz) else 0
    return pack_bits(zz, w), {"first": int(v[0]), "width": w}


def delta_decode(payload: bytes, meta: dict, n: int, out_dtype=np.int64) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=out_dtype)
    zz = unpack_bits(payload, meta["width"], n - 1)
    d = zigzag_decode(zz)
    out = np.empty(n, dtype=np.int64)
    out[0] = meta["first"]
    np.cumsum(d, out=out[1:])
    out[1:] += np.int64(meta["first"])
    return out.astype(out_dtype, copy=False)


# ------------------------------------------------------------------ rle
def rle_encode(values: np.ndarray) -> tuple[bytes, dict]:
    """(run values FOR-packed, run lengths bit-packed)."""
    v = np.ascontiguousarray(values)
    ends = run_ends(v)
    if len(ends):
        run_vals = v[np.concatenate([[0], ends[:-1]])]
        lengths = np.diff(np.concatenate([[0], ends]))
    else:
        run_vals, lengths = v[:0], ends
    vp, vm = for_encode(run_vals)
    lp, lm = bitpack_encode(lengths)
    payload = pack_frames([vp, lp])
    return payload, {"n_runs": int(len(ends)), "values": vm, "lengths": lm}


def rle_decode(payload: bytes, meta: dict, n: int, out_dtype=np.int64) -> np.ndarray:
    k = meta["n_runs"]
    vp, lp = unpack_frames(payload)
    run_vals = for_decode(vp, meta["values"], k, out_dtype=out_dtype)
    lengths = bitpack_decode(lp, meta["lengths"], k)
    return np.repeat(run_vals, lengths).astype(out_dtype, copy=False)


# ----------------------------------------------------------------- dict
def dict_encode(values: np.ndarray) -> tuple[bytes, dict]:
    """sorted-unique dictionary (FOR-packed) + bit-packed codes.

    Decode is ``dictionary.take(codes)`` — same access pattern as the
    reference's dictionary-aware converters (StringConverter.java:39-55).
    """
    v = np.ascontiguousarray(values)
    uniq, codes = np.unique(v, return_inverse=True)
    dp, dm = for_encode(uniq)
    cp, cm = bitpack_encode(codes.astype(np.int32, copy=False)
                            if len(uniq) <= _I32_MAX else codes)
    payload = pack_frames([dp, cp])
    return payload, {"card": int(len(uniq)), "dict": dm, "codes": cm}


def dict_decode(payload: bytes, meta: dict, n: int, out_dtype=np.int64) -> np.ndarray:
    dp, cp = unpack_frames(payload)
    uniq = for_decode(dp, meta["dict"], meta["card"], out_dtype=out_dtype)
    codes = bitpack_decode(cp, meta["codes"], n, out_dtype=np.int64)
    return uniq[codes]


INT_CODECS = {
    "plain": (plain_encode, plain_decode),
    "bitpack": (bitpack_encode, bitpack_decode),
    "for": (for_encode, for_decode),
    "delta": (delta_encode, delta_decode),
    "rle": (rle_encode, rle_decode),
    "dict": (dict_encode, dict_decode),
}


def encode_ints(values: np.ndarray, codec: str) -> tuple[bytes, dict]:
    return INT_CODECS[codec][0](values)


def decode_ints(payload: bytes, codec: str, meta: dict, n: int,
                out_dtype=np.int64) -> np.ndarray:
    return INT_CODECS[codec][1](payload, meta, n, out_dtype=out_dtype)
