"""Deterministic synthetic sequences table (FIXTURES.md F1).

Seeded generator for the canonical input
``(doc_id string, tokens array<int32>, n_tok int, source string)``:
Zipf token ids over a 50,257-id vocabulary, long-tail lognormal
lengths with a 1% x16 skew tail, 10% RLE-friendly repetitive rows,
10% sorted rows, plus pinned edge rows. Built as a pyarrow Table
(flat values + offsets — no per-row Python) and handed to Spark via
Arrow.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

VOCAB = 50257
SOURCES = ["web", "books", "code", "wiki", "chat"]
SOURCE_WEIGHTS = np.array([1.0, 1 / 2, 1 / 3, 1 / 4, 1 / 5])


def synth_arrow(n_rows: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    src_idx = rng.choice(len(SOURCES), size=n_rows, p=SOURCE_WEIGHTS / SOURCE_WEIGHTS.sum())
    n_tok = np.clip(rng.lognormal(np.log(100), 1.0, n_rows), 1, 8192).astype(np.int64)
    tail = rng.random(n_rows) < 0.01
    n_tok[tail] = np.clip(n_tok[tail] * 16, 1, 131072)

    # pinned edge rows (FIXTURES.md F1)
    if n_rows >= 5:
        n_tok[0] = 1
        n_tok[1] = 64       # all-equal
        n_tok[2] = 64       # max-int32 values
        n_tok[3] = 512      # strictly increasing
        n_tok[4] = 512      # high-cardinality uniform

    total = int(n_tok.sum())
    flat = ((rng.zipf(1.1, total) - 1) % VOCAB).astype(np.int32)
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])

    # 10% locally repetitive rows (RLE-friendly), 10% sorted (delta/FOR)
    rep_rows = np.flatnonzero(rng.random(n_rows) < 0.10)
    for i in rep_rows[:20000]:
        lo, hi = offsets[i], offsets[i + 1]
        seg = max(1, (hi - lo) // 8)
        reps = -((lo - hi) // seg)  # ceil division
        flat[lo:hi] = np.repeat(flat[lo : lo + seg], reps)[: hi - lo]
    sort_rows = np.flatnonzero(rng.random(n_rows) < 0.10)
    for i in sort_rows[:20000]:
        lo, hi = offsets[i], offsets[i + 1]
        flat[lo:hi] = np.sort(flat[lo:hi])

    if n_rows >= 5:
        o = offsets
        flat[o[1] : o[2]] = 12345
        flat[o[2] : o[3]] = np.int32(2**31 - 1)
        flat[o[3] : o[4]] = np.arange(o[4] - o[3], dtype=np.int32)
        flat[o[4] : o[5]] = rng.integers(0, 2**31 - 1, int(o[5] - o[4]), dtype=np.int32)

    sources = np.array(SOURCES)[src_idx]
    idx = np.char.zfill(np.arange(n_rows).astype("U12"), 10)
    h = np.char.mod("%08x", (np.arange(n_rows) * 2654435761 + seed) % (2**32))
    doc_id = np.char.add(np.char.add(np.char.add(sources, "-"), idx), np.char.add("-", h))

    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(flat, pa.int32())
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_id.tolist(), pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(n_tok, pa.int32()),
            "source": pa.array(sources.tolist(), pa.string()),
        }
    )


def synth_df(spark, n_rows: int, seed: int = 42, partitions: int = 32):
    from tokcodec.schema import SEQ_SCHEMA

    df = spark.createDataFrame(synth_arrow(n_rows, seed), schema=SEQ_SCHEMA)
    return df.repartition(partitions)
