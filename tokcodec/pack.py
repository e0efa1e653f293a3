"""Sequence packing — the training-data layout step.

Concat-and-chunk (GPT-style) packing: within each (group, shard),
documents are laid end-to-end in ascending ``id_col`` order and the
concatenated token stream is cut into fixed ``window``-token context
windows; the final partial window is padded with ``pad_id``. Besides
the packed token arrays, each window row carries the bookkeeping a
training pipeline wants: real (unpadded) token count, number of
documents beginning in the window, number of those that straddle into
the next window, and the window's token-value checksum.

Reference parity: the reference stops at (de)serialization
(CarpetWriter/CarpetReader); packing is one of the beyond-reference
training-pipeline operators SURVEY.md §2 calls for. The driver-oracled
``pack_sequences`` query in ``__spark_entry__`` routes THROUGH this
operator and checks its aggregate bookkeeping (total tokens, window
count, straddlers, padding, max docs/window, token checksum) against a
pure-SQL recomputation — a value-level gate on the packed output.

Scale shape: one ``applyInArrow`` task per (group, shard). A group at
10^12-token scale does NOT need global order — production packers pack
per shard/file — so ``n_shards`` bounds task memory: each (group,
shard) packs independently and deterministically (shard =
``pmod(xxhash64(id), n_shards)``). Inside the task everything is numpy
over Arrow buffers (no per-row Python): one ``take`` to sort, one
concatenate+reshape to window.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame, functions as F

_SHARD_COL = "__pack_shard"


def pack_sequences(
    df: DataFrame,
    window: int,
    group_cols: tuple[str, ...] = ("source",),
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    pad_id: int = 0,
    n_shards: int = 1,
) -> DataFrame:
    """Pack ``df``'s token sequences into fixed-size context windows.

    Returns one row per packed window:
      ``group_cols... , shard int, window_id long, tokens (input value
      type), n_tok_real int, docs_begin int, straddlers int,
      tok_sum long``
    ``tok_sum`` sums only real tokens (padding excluded), so it is a
    position-insensitive checksum of the window's payload.
    """
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    spark_schema = dict(df.dtypes)
    for c in (*group_cols, id_col, tokens_col):
        if c not in spark_schema:
            raise ValueError(f"column {c!r} not in DataFrame")

    shard_expr = (
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")
        if n_shards > 1
        else F.lit(0).cast("int")
    )
    keyed = df.select(
        *group_cols, id_col, tokens_col, shard_expr.alias(_SHARD_COL)
    )

    sample = keyed.schema
    tok_field = sample[tokens_col].dataType
    tok_ddl = tok_field.simpleString()  # e.g. array<int>
    group_ddl = ", ".join(
        f"{c} {sample[c].dataType.simpleString()}" for c in group_cols
    )
    out_ddl = (
        f"{group_ddl}, shard int, window_id long, tokens {tok_ddl}, "
        "n_tok_real int, docs_begin int, straddlers int, tok_sum long"
    )

    n_group = len(group_cols)
    L = window
    pad = pad_id

    # NOTE: no type annotations — pyspark's applyInArrow hint
    # inference fails on partially annotated callables
    def fn(key, tbl):
        ids = tbl.column(id_col).combine_chunks()
        toks = tbl.column(tokens_col).combine_chunks()
        if toks.null_count:
            raise ValueError("pack_sequences: null token arrays")
        order = pc.sort_indices(ids)
        toks = toks.take(order)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lens = lens.astype(np.int64)
        values = toks.flatten().to_numpy(zero_copy_only=False)
        total = int(lens.sum())
        n_win = -(-total // L) if total else 0
        cols: list[pa.Array] = []
        if n_win == 0:
            empty = pa.table(
                {
                    **{c: pa.array([], type=tbl.schema.field(c).type)
                       for c in group_cols},
                    "shard": pa.array([], pa.int32()),
                    "window_id": pa.array([], pa.int64()),
                    "tokens": pa.array([], toks.type),
                    "n_tok_real": pa.array([], pa.int32()),
                    "docs_begin": pa.array([], pa.int32()),
                    "straddlers": pa.array([], pa.int32()),
                    "tok_sum": pa.array([], pa.int64()),
                }
            )
            return empty
        pad_n = n_win * L - total
        padded = np.concatenate(
            [values, np.full(pad_n, pad, dtype=values.dtype)]
        )
        wins = padded.reshape(n_win, L)
        # per-doc window spans (empty docs occupy no window)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        ends = starts + lens
        nz = lens > 0
        w_start = starts[nz] // L
        w_end = (ends[nz] - 1) // L
        docs_begin = np.bincount(w_start, minlength=n_win)
        straddlers = np.bincount(
            w_start[w_end > w_start], minlength=n_win
        )
        n_real = np.full(n_win, L, dtype=np.int64)
        n_real[-1] = L - pad_n
        tok_sum = wins.sum(axis=1, dtype=np.int64) - (
            np.concatenate(
                (np.zeros(n_win - 1, dtype=np.int64), [pad_n])
            )
            * pad
        )
        offsets = pa.array(
            np.arange(n_win + 1, dtype=np.int32) * L, pa.int32()
        )
        win_arr = pa.ListArray.from_arrays(
            offsets, pa.array(padded, type=toks.type.value_type)
        )
        for i in range(n_group):
            cols.append(
                pa.array([key[i].as_py()] * n_win,
                         type=tbl.schema.field(group_cols[i]).type)
            )
        cols += [
            pa.array([key[n_group].as_py()] * n_win, pa.int32()),
            pa.array(np.arange(n_win, dtype=np.int64)),
            win_arr,
            pa.array(n_real.astype(np.int32)),
            pa.array(docs_begin.astype(np.int32)),
            pa.array(straddlers.astype(np.int32)),
            pa.array(tok_sum),
        ]
        return pa.table(
            dict(
                zip(
                    [*group_cols, "shard", "window_id", "tokens",
                     "n_tok_real", "docs_begin", "straddlers", "tok_sum"],
                    cols,
                )
            )
        )

    return keyed.groupBy(*group_cols, _SHARD_COL).applyInArrow(
        fn, schema=out_ddl
    )
