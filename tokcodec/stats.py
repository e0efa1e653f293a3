"""Per-chunk statistics feeding the codec auto-selector.

The reference always delegates this decision to parquet-java's writer
(dictionary fallback heuristics behind the knobs at reference
CarpetWriter.java:335-385); per the north rule we compute explicit
stats per (column, partition-bucket) chunk and pick the codec
ourselves. Stats are persisted to lineage (C5 in SURVEY.md §2.1).

Bandwidth discipline: stats run in the column's native dtype and make
the minimum number of full passes — at 32 cores the encoder is
memory-bound, and every extra pass over a token chunk costs real
scaling efficiency. Cardinality is estimated from a sample (exact
uniqueness is only computed by dict_encode itself if dict wins).
"""

from __future__ import annotations

import numpy as np

from tokcodec.kernels import bits_needed

CARD_SAMPLE = 1 << 16
DICT_CARD_GATE = 4096   # sample card above this: dict can't win on ints
STATS_WINDOW = 1 << 18  # run/delta stats from a window on huge chunks


def int_chunk_stats(v: np.ndarray) -> dict:
    """v: numpy int array in its native dtype.

    min/max are exact (codecs need them); run/sortedness/delta stats
    come from a contiguous window on huge chunks — they only steer
    *selection*, and each codec derives its real parameters from the
    full data at encode time, so a sampling miss costs bytes, never
    correctness. This keeps stats ~O(window) instead of 3+ full passes
    per chunk (the encoder is memory-bound at full core count).
    """
    n = len(v)
    if n == 0:
        return {
            "n": 0, "min": 0, "max": 0, "n_runs": 0, "card": 0,
            "sorted": True, "max_run_len": 0, "width_for": 0,
            "width_delta": 0, "run_width_for": 0,
        }
    vmin, vmax = int(v.min()), int(v.max())
    rng = vmax - vmin
    w = v if n <= STATS_WINDOW else v[(n - STATS_WINDOW) // 2:][:STATS_WINDOW]
    nw = len(w)
    scale = n / nw
    if nw > 1:
        if rng <= 2**31 - 1 and v.dtype.itemsize <= 4:
            d = np.diff(w)
        else:
            d = np.diff(w.astype(np.int64, copy=False))
        nz = d != 0
        n_runs = int((np.count_nonzero(nz) + 1) * scale)
        srted = bool((d >= 0).all())
        width_delta = bits_needed(2 * int(np.abs(d).max()) + 1)
    else:
        nz = np.zeros(0, dtype=bool)
        n_runs, srted, width_delta = 1, True, 0
    # exact run-length histogram only when RLE is plausible
    if n_runs <= n // 4 + 1:
        idx = np.flatnonzero(nz)
        ends = np.concatenate([idx + 1, [nw]])
        max_run_len = int(np.diff(np.concatenate([[0], ends])).max() * scale)
    else:
        max_run_len = n  # conservative; RLE won't be picked anyway
    # sampled cardinality (exact when the chunk fits in one sample)
    stride = max(1, n // CARD_SAMPLE)
    samp = v[::stride]
    samp_card = int(len(np.unique(samp)))
    if stride == 1:
        card = samp_card
    elif samp_card <= DICT_CARD_GATE:
        card = int(samp_card * 1.1) + 1  # low-card: sample ≈ population
    else:
        card = n  # high-card: dict hopeless, skip exact count
    return {
        "n": n,
        "min": vmin,
        "max": vmax,
        "n_runs": max(n_runs, 1),
        "card": card,
        "sorted": srted,
        "max_run_len": max(max_run_len, 1),
        "width_for": bits_needed(rng),
        "width_delta": width_delta,
        "run_width_for": bits_needed(rng),  # upper bound for run values
    }


def str_chunk_stats(data: bytes, lengths: np.ndarray, card: int) -> dict:
    n = len(lengths)
    return {
        "n": n,
        "total_bytes": len(data),
        "avg_len": (len(data) / n) if n else 0.0,
        "card": card,
        "max_len": int(lengths.max()) if n else 0,
    }
