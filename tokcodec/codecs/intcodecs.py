"""Integer column codecs: plain / bitpack / FOR / delta / RLE / dict.

Each codec is an ``(encode, decode)`` pair over a whole numpy int array
(one column chunk = one Spark partition-bucket x column). ``encode``
returns ``(payload: bytes, meta: dict)``; ``decode(payload, meta, n)``
returns an int64 numpy array (caller casts to the column's dtype).

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
    unpack_bits,
    unpack_frames,
    zigzag_decode,
    zigzag_encode,
)


def _as_i64(values) -> np.ndarray:
    return np.ascontiguousarray(values, dtype=np.int64)


# ---------------------------------------------------------------- plain
def plain_encode(values: np.ndarray) -> tuple[bytes, dict]:
    v = np.ascontiguousarray(values)
    return v.tobytes(), {"dtype": v.dtype.str}


def plain_decode(payload: bytes, meta: dict, n: int) -> np.ndarray:
    return np.frombuffer(payload, dtype=np.dtype(meta["dtype"]), count=n).astype(np.int64)


# -------------------------------------------------------------- bitpack
def bitpack_encode(values: np.ndarray) -> tuple[bytes, dict]:
    """Unsigned bit-packing; requires min >= 0 (use FOR otherwise)."""
    v = _as_i64(values)
    if len(v) and int(v.min()) < 0:
        raise ValueError("bitpack requires non-negative values; use 'for'")
    w = bits_needed(int(v.max())) if len(v) else 0
    return pack_bits(v.view(np.uint64), w), {"width": w}


def bitpack_decode(payload: bytes, meta: dict, n: int) -> np.ndarray:
    return unpack_bits(payload, meta["width"], n).astype(np.int64)


# ------------------------------------------------- frame-of-reference
def for_encode(values: np.ndarray) -> tuple[bytes, dict]:
    v = _as_i64(values)
    ref = int(v.min()) if len(v) else 0
    shifted = (v - ref).view(np.uint64)
    w = bits_needed(int(shifted.max())) if len(v) else 0
    return pack_bits(shifted, w), {"ref": ref, "width": w}


def for_decode(payload: bytes, meta: dict, n: int) -> np.ndarray:
    u = unpack_bits(payload, meta["width"], n)
    return u.view(np.int64) + np.int64(meta["ref"])


# ---------------------------------------------------------------- delta
def delta_encode(values: np.ndarray) -> tuple[bytes, dict]:
    """first value + zigzag(bit-packed) deltas; wins on sorted data."""
    v = _as_i64(values)
    if len(v) == 0:
        return b"", {"first": 0, "width": 0}
    d = np.diff(v)
    zz = zigzag_encode(d)
    w = bits_needed(int(zz.max())) if len(zz) else 0
    return pack_bits(zz, w), {"first": int(v[0]), "width": w}


def delta_decode(payload: bytes, meta: dict, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    zz = unpack_bits(payload, meta["width"], n - 1)
    d = zigzag_decode(zz)
    out = np.empty(n, dtype=np.int64)
    out[0] = meta["first"]
    np.cumsum(d, out=out[1:])
    out[1:] += np.int64(meta["first"])
    return out


# ------------------------------------------------------------------ rle
def rle_encode(values: np.ndarray) -> tuple[bytes, dict]:
    """(run values FOR-packed, run lengths bit-packed)."""
    v = _as_i64(values)
    ends = run_ends(v)
    run_vals = v[np.concatenate([[0], ends[:-1]])] if len(ends) else v[:0]
    lengths = np.diff(np.concatenate([[0], ends])) if len(ends) else ends
    vp, vm = for_encode(run_vals)
    lp, lm = bitpack_encode(lengths)
    payload = pack_frames([vp, lp])
    return payload, {"n_runs": int(len(ends)), "values": vm, "lengths": lm}


def rle_decode(payload: bytes, meta: dict, n: int) -> np.ndarray:
    k = meta["n_runs"]
    vp, lp = unpack_frames(payload)
    run_vals = for_decode(vp, meta["values"], k)
    lengths = bitpack_decode(lp, meta["lengths"], k)
    return np.repeat(run_vals, lengths)


# ----------------------------------------------------------------- dict
def dict_encode(values: np.ndarray) -> tuple[bytes, dict]:
    """sorted-unique dictionary (FOR-packed) + bit-packed codes.

    Decode is ``dictionary.take(codes)`` — same access pattern as the
    reference's dictionary-aware converters (StringConverter.java:39-55).
    """
    v = _as_i64(values)
    uniq, codes = np.unique(v, return_inverse=True)
    dp, dm = for_encode(uniq)
    cp, cm = bitpack_encode(codes.astype(np.int64))
    payload = pack_frames([dp, cp])
    return payload, {"card": int(len(uniq)), "dict": dm, "codes": cm}


def dict_decode(payload: bytes, meta: dict, n: int) -> np.ndarray:
    dp, cp = unpack_frames(payload)
    uniq = for_decode(dp, meta["dict"], meta["card"])
    codes = bitpack_decode(cp, meta["codes"], n)
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


def decode_ints(payload: bytes, codec: str, meta: dict, n: int) -> np.ndarray:
    return INT_CODECS[codec][1](payload, meta, n)
