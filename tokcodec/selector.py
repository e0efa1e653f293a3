"""Statistics-driven codec auto-selection (the engine's only "optimizer").

Per (column, bucket) chunk: compute stats, evaluate an *exact* size
model per candidate codec (bit widths are exact given min/max/runs/card
— no guessing), pick argmin. This replaces the decision the reference
delegates to parquet-java (dictionary fallback etc., reference
CarpetWriter.java:335-385 / SURVEY.md C1) with an explicit, logged
choice (BASELINE.json north_star: "statistics-driven codec
auto-selector (cardinality, run-length histogram, value range per
column chunk)").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tokcodec.codecs.fsst import SAMPLE_BYTES, fsst_encode
from tokcodec.kernels import bits_needed
from tokcodec.stats import int_chunk_stats

_FRAME_OVERHEAD = 24  # headers per compound payload, amortized constant


def size_model_int(st: dict, itemsize: int) -> dict[str, float]:
    """Exact encoded-size (bytes) per candidate codec, from stats."""
    n = st["n"]
    sizes = {"plain": n * itemsize}
    if st["min"] >= 0:
        sizes["bitpack"] = n * bits_needed(st["max"]) / 8
    sizes["for"] = n * st["width_for"] / 8
    sizes["delta"] = n * st["width_delta"] / 8
    sizes["rle"] = (
        st["n_runs"] * st["run_width_for"] / 8
        + st["n_runs"] * bits_needed(st["max_run_len"]) / 8
        + _FRAME_OVERHEAD
    )
    if st["card"] < n:
        code_w = bits_needed(max(st["card"] - 1, 0))
        sizes["dict"] = (
            st["card"] * st["width_for"] / 8 + n * code_w / 8 + _FRAME_OVERHEAD
        )
    return sizes


def select_int_codec(v: np.ndarray, itemsize: int) -> tuple[str, dict]:
    """-> (codec name, stats dict). v must be int64."""
    st = int_chunk_stats(v)
    if st["n"] == 0:
        return "plain", st
    sizes = size_model_int(st, itemsize)
    codec = min(sizes, key=sizes.get)
    st["est_sizes"] = {k: round(s, 1) for k, s in sizes.items()}
    return codec, st


def select_str_codec(data: bytes, lengths: np.ndarray, arr: pa.Array) -> tuple[str, dict]:
    """-> (codec name, stats dict) for a string chunk.

    dict wins at low cardinality; FSST is trialed on a sample when
    cardinality is high (its ratio is not predictable from stats alone,
    so we measure — cheap: sample is capped at SAMPLE_BYTES).
    """
    n = len(lengths)
    if n == 0 or len(data) == 0:
        return "plain_str", {"n": n, "total_bytes": len(data), "card": 0}
    # cardinality from a sample of values
    k = min(n, 4096)
    samp = arr.slice(0, k)
    denc = samp.dictionary_encode()
    card_s = len(denc.dictionary)
    st = {"n": n, "total_bytes": len(data), "card_sample": int(card_s)}
    len_w = bits_needed(int(lengths.max()))
    plain_size = len(data) + n * len_w / 8
    st["est_plain"] = round(plain_size, 1)
    if card_s <= max(64, 0.02 * k):
        # low cardinality: dict ≈ uniq bytes + n*log2(card)/8 — wins
        return "dict_str", st
    # trial FSST on a bounded sample
    samp_rows = int(np.searchsorted(np.cumsum(lengths), SAMPLE_BYTES)) + 1
    samp_rows = min(n, max(samp_rows, 256))
    s_lengths = lengths[:samp_rows]
    s_data = data[: int(s_lengths.sum())]
    payload, _ = fsst_encode(s_data, s_lengths)
    ratio = len(payload) / max(len(s_data) + samp_rows * len_w / 8, 1)
    st["fsst_sample_ratio"] = round(ratio, 3)
    if ratio < 0.95:
        return "fsst", st
    return "plain_str", st
