"""Per-chunk statistics feeding the codec auto-selector.

The reference always delegates this decision to parquet-java's writer
(dictionary fallback heuristics behind the knobs at reference
CarpetWriter.java:335-385); per the north rule we compute explicit
stats per (column, partition-bucket) chunk and pick the codec
ourselves. Stats are also persisted to the lineage table (C5 in
SURVEY.md §2.1: the reference's column-statistics knobs become
always-on here because the selector needs them).
"""

from __future__ import annotations

import numpy as np

from tokcodec.kernels import bits_needed, run_ends

# above this chunk size, cardinality is estimated on a sample first and
# the exact np.unique pass only runs when dict encoding could plausibly win
CARD_SAMPLE = 1 << 16
DICT_MAX_CARD_FRACTION = 0.5


def int_chunk_stats(v: np.ndarray) -> dict:
    """v: int64 array. Returns the selector's feature dict."""
    n = len(v)
    if n == 0:
        return {
            "n": 0, "min": 0, "max": 0, "n_runs": 0, "card": 0,
            "sorted": True, "max_run_len": 0, "width_for": 0,
            "width_delta": 0, "run_width_for": 0,
        }
    vmin, vmax = int(v.min()), int(v.max())
    ends = run_ends(v)
    n_runs = len(ends)
    lengths = np.diff(np.concatenate([[0], ends]))
    d = np.diff(v) if n > 1 else np.zeros(0, dtype=np.int64)
    srted = bool((d >= 0).all()) if len(d) else True
    # zigzag delta width (what the delta codec would use)
    if len(d):
        max_abs = int(np.abs(d).max())
        width_delta = bits_needed(2 * max_abs + 1)
    else:
        width_delta = 0
    # cardinality: sample-gated exact count
    if n > CARD_SAMPLE:
        samp = v[:: max(1, n // CARD_SAMPLE)]
        samp_card = len(np.unique(samp))
        if samp_card > DICT_MAX_CARD_FRACTION * len(samp):
            card = n  # dict hopeless; report worst case
        else:
            card = int(len(np.unique(v)))
    else:
        card = int(len(np.unique(v)))
    run_vals = v[np.concatenate([[0], ends[:-1]])]
    return {
        "n": n,
        "min": vmin,
        "max": vmax,
        "n_runs": int(n_runs),
        "card": card,
        "sorted": srted,
        "max_run_len": int(lengths.max()),
        "width_for": bits_needed(vmax - vmin),
        "width_delta": width_delta,
        "run_width_for": bits_needed(int(run_vals.max()) - int(run_vals.min())),
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
