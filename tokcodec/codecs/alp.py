"""ALP: adaptive lossless floating-point compression.

From-scratch vectorized re-implementation of the PUBLIC algorithm
("ALP: Adaptive Lossless floating-Point Compression", Afroozeh &
Boncz, SIGMOD 2024; the DuckDB/FastLanes float codec). Real-world
float columns — prices, quality scores, probabilities rounded for
storage — are overwhelmingly *decimals*: ``v == round(v * 10^e) /
10^e`` for some small ``e``. ALP finds, per chunk, a decimal exponent
pair ``(e, f)`` and stores each value as the integer

    I = round(v * 10^e / 10^f)

which then rides the existing frame-of-reference + bit-pack int lane
(a 2-decimal price column packs to ~2 bytes/value before the outer
zstd layer instead of 8). Values that don't round-trip *bit-identical*
through ``decode = (I * 10^f) / 10^e`` — noise, NaN, ±inf, -0.0,
out-of-int64-range — become *exceptions*: stored verbatim with their
positions and patched over the decoded output, so the codec is
lossless on ANY input by construction (the reference's float columns
get no lightweight encoding at all — parquet PLAIN or byte-stream
split, CarpetWriter.java:352-361 — so this strictly extends parity).

Correctness does not depend on floating-point folklore: the encoder
*verifies* every value against the exact decode expression (same
dtype, same operation order) and patches whatever fails. ``10.0**x``
is exactly representable for x <= 22, and both the scale-up multiply
and the decode divide are single correctly-rounded IEEE-754 ops, so
encode and decode agree deterministically across machines.

Chunk-local exponent choice is sampled (<= 1024 values), scoring each
candidate by exceptions * value-width + FOR bit-width * n — the
paper's compression-size criterion. A sample exception rate > 30%
means "not decimal data"; the selector then falls back to
byte-stream-split / plain.
"""

from __future__ import annotations

import numpy as np

from tokcodec.codecs.intcodecs import for_decode, for_encode
from tokcodec.kernels import (
    bits_needed,
    pack_bits,
    pack_frames,
    snap_width,
    unpack_bits,
    unpack_frames,
)

_MAX_E = 16          # 10^16 < 2^53: round() stays exact in double
_SAMPLE = 1024
# |I| must stay well inside int64 AND inside float64's exact-integer
# range so the decode multiply sees the same integer the encoder chose
_I_LIMIT = float(2**51)

_EXP10 = [np.float64(10.0) ** k for k in range(_MAX_E + 1)]


def _roundtrip(v64: np.ndarray, e: int, f: int, out_dtype: np.dtype
               ) -> tuple[np.ndarray, np.ndarray]:
    """(I as float64, bit-exact mask) for candidate (e, f) — the ONE
    definition of the transform, shared by search, encode and the
    final verification (decode mirrors it)."""
    with np.errstate(invalid="ignore", over="ignore"):
        scaled = v64 * _EXP10[e] / _EXP10[f]
        # np.rint, not np.round: same half-to-even semantics for
        # decimals=0 but ~300x faster (np.round takes a slow generic
        # path); exactness is verified below either way
        I = np.rint(scaled)
        ok = np.isfinite(I) & (np.abs(I) < _I_LIMIT)
        # verify through the int64 quantization decode will see
        # (catches -0.0, whose float round-trip is deceptively exact)
        I = np.where(ok, I, 0.0).astype(np.int64).astype(np.float64)
        back = I * _EXP10[f] / _EXP10[e]
    if out_dtype == np.float32:
        back = back.astype(np.float32)
        exact = back.view(np.uint32) == v64.astype(np.float32).view(np.uint32)
    else:
        exact = back.view(np.uint64) == v64.view(np.uint64)
    return I, ok & exact


def _choose(v64: np.ndarray, out_dtype: np.dtype) -> tuple[int, int, float]:
    """Pick (e, f) on a sample; returns (e, f, sample_exception_rate).
    Candidates walk e upward and stop improving once exact; f strips
    shared trailing decimal zeros (v = k * 10^f patterns)."""
    s = v64[:: max(1, len(v64) // _SAMPLE)][:_SAMPLE]
    bits = 8 * out_dtype.itemsize
    best = (0, 0, float("inf"), 1.0)
    for e in range(_MAX_E + 1):
        for f in (0, min(e, 2), min(e, 4)) if e else (0,):
            I, exact = _roundtrip(s, e, f, out_dtype)
            n_exc = int(len(s) - exact.sum())
            if exact.any():
                ivals = I[exact]
                w = snap_width(bits_needed(
                    int(ivals.max() - ivals.min())))
            else:
                w = bits
            cost = n_exc * (bits + 16) + w * len(s)
            if cost < best[2]:
                best = (e, f, cost, n_exc / max(1, len(s)))
        if best[3] == 0.0 and best[0] <= e - 2:
            break  # exact fit found and larger e stopped helping
    return best[0], best[1], best[3]


def alp_probe(values: np.ndarray) -> float:
    """Sample exception rate for the best (e, f) — the selector's
    cheap 'is this decimal data' gate."""
    if len(values) == 0:
        return 1.0
    v64 = np.ascontiguousarray(values, dtype=np.float64)
    return _choose(v64, np.dtype(values.dtype))[2]


def alp_encode(values: np.ndarray) -> tuple[bytes, dict]:
    v = np.ascontiguousarray(values)
    out_dtype = np.dtype(v.dtype)
    meta: dict = {"dtype": out_dtype.str}
    if len(v) == 0:
        meta.update(e=0, f=0, n_exc=0, ints={"ref": 0, "width": 0},
                    pos_width=0)
        return pack_frames([b"", b"", b""]), meta
    v64 = v.astype(np.float64, copy=False)
    e, f, _ = _choose(v64, out_dtype)
    I, exact = _roundtrip(v64, e, f, out_dtype)
    exc_idx = np.flatnonzero(~exact)
    # patch exceptions with the first in-range value: keeps the FOR
    # frame tight and the packed width unaffected by the patch value
    if len(exc_idx):
        fill = I[exact][0] if exact.any() else np.float64(0.0)
        I[exc_idx] = fill
    ints = I.astype(np.int64)
    ip, im = for_encode(ints)
    pos_width = snap_width(bits_needed(int(exc_idx[-1]))) \
        if len(exc_idx) else 0
    pp = pack_bits(exc_idx.astype(np.uint64), pos_width)
    ep = np.ascontiguousarray(v[exc_idx]).tobytes()
    meta.update(e=e, f=f, n_exc=int(len(exc_idx)), ints=im,
                pos_width=pos_width)
    return pack_frames([ip, pp, ep]), meta


def alp_decode(payload: bytes, meta: dict, n: int) -> np.ndarray:
    out_dtype = np.dtype(meta["dtype"])
    ip, pp, ep = unpack_frames(payload)
    ints = for_decode(ip, meta["ints"], n, out_dtype=np.int64)
    # mirror of _roundtrip's decode expression, bit-for-bit
    back = ints.astype(np.float64) * _EXP10[meta["f"]] / _EXP10[meta["e"]]
    out = back.astype(out_dtype, copy=False) \
        if out_dtype == np.float32 else back
    out = np.ascontiguousarray(out)
    k = meta["n_exc"]
    if k:
        idx = unpack_bits(pp, meta["pos_width"], k).astype(np.int64)
        out[idx] = np.frombuffer(ep, dtype=out_dtype, count=k)
    return out
