"""tokcodec.pack.pack_sequences vs a pure-Python reference packer.

The reference implementation below is deliberately naive (sort, python
list concat, slice) — any disagreement in window contents, padding,
doc-boundary bookkeeping, or checksums is an operator bug.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tokcodec.pack import pack_sequences


def _ref_pack(rows, L, pad_id=0):
    """rows: list of (group, id, tokens). Returns
    {(group): [ (window_id, tokens, n_real, docs_begin, straddlers,
                 tok_sum) ]}"""
    out = {}
    groups = sorted({r[0] for r in rows})
    for g in groups:
        docs = sorted((r[1], r[2]) for r in rows if r[0] == g)
        stream = [t for _i, toks in docs for t in toks]
        total = len(stream)
        n_win = -(-total // L) if total else 0
        wins = []
        starts, pos = [], 0
        spans = []
        for _i, toks in docs:
            if toks:
                spans.append((pos // L, (pos + len(toks) - 1) // L))
            pos += len(toks)
        for w in range(n_win):
            chunk = stream[w * L:(w + 1) * L]
            n_real = len(chunk)
            chunk = chunk + [pad_id] * (L - n_real)
            docs_begin = sum(1 for s, _e in spans if s == w)
            straddlers = sum(1 for s, e in spans if s == w and e > w)
            wins.append((w, chunk, n_real, docs_begin, straddlers,
                         sum(chunk[:n_real])))
        out[g] = wins
    return out


def _collect(df):
    got = {}
    for r in df.collect():
        got.setdefault(r.source, []).append(
            (r.window_id, list(r.tokens), r.n_tok_real, r.docs_begin,
             r.straddlers, r.tok_sum)
        )
    for g in got:
        got[g].sort()
    return got


def _run(spark, rows, L, **kw):
    df = spark.createDataFrame(
        [(g, i, t) for g, i, t in rows],
        "source string, did long, tokens array<int>",
    )
    return pack_sequences(df, window=L, group_cols=("source",),
                          id_col="did", **kw)


def test_pack_matches_reference(spark):
    rng = np.random.default_rng(7)
    rows = []
    for g in ["a", "b", "c"]:
        for i in range(40):
            n = int(rng.integers(0, 37))
            rows.append((g, i * 3 + 1, [int(x) for x in
                         rng.integers(-5, 9999, n)]))
    # unsorted input order must not matter
    rng.shuffle(rows)
    got = _collect(_run(spark, rows, L=64))
    want = _ref_pack(rows, L=64)
    want = {g: w for g, w in want.items() if w}
    assert got == want


def test_pack_single_padded_window_and_exact_fit(spark):
    rows = [("a", 1, [1, 2, 3]), ("b", 1, [1, 2]), ("b", 2, [3, 4])]
    got = _collect(_run(spark, rows, L=4))
    assert got["a"] == [(0, [1, 2, 3, 0], 3, 1, 0, 6)]
    # group b fits exactly: no padding, doc 2 begins mid-window
    assert got["b"] == [(0, [1, 2, 3, 4], 4, 2, 0, 10)]


def test_pack_straddler_and_empty_docs(spark):
    rows = [("a", 1, [1] * 6), ("a", 2, []), ("a", 3, [2] * 3)]
    got = _collect(_run(spark, rows, L=4))
    # doc1 spans windows 0-1; doc3 starts in window 1 and spills to 2
    assert got["a"] == [
        (0, [1, 1, 1, 1], 4, 1, 1, 4),
        (1, [1, 1, 2, 2], 4, 1, 1, 6),
        (2, [2, 0, 0, 0], 1, 0, 0, 2),
    ]


def test_pack_nonzero_pad_id_excluded_from_checksum(spark):
    rows = [("a", 1, [5, 5, 5])]
    df = _run(spark, rows, L=4, pad_id=-1)
    r = df.collect()[0]
    assert list(r.tokens) == [5, 5, 5, -1]
    assert r.n_tok_real == 3 and r.tok_sum == 15


def test_pack_sharding_partitions_docs(spark):
    rows = [("a", i, [i] * 5) for i in range(50)]
    df = _run(spark, rows, L=16, n_shards=4)
    out = df.collect()
    # every shard packs independently; union must conserve tokens
    assert sum(r.n_tok_real for r in out) == 250
    assert sum(r.tok_sum for r in out) == sum(i * 5 for i in range(50))
    shards = {r.shard for r in out}
    assert len(shards) > 1  # xxhash spread across 4 shards
    # per-shard window ids are dense from 0
    for s in shards:
        ws = sorted(r.window_id for r in out if r.shard == s)
        assert ws == list(range(len(ws)))


def test_pack_null_tokens_rejected(spark):
    df = spark.createDataFrame(
        [("a", 1, [1, 2]), ("a", 2, None)],
        "source string, did long, tokens array<int>",
    )
    with pytest.raises(Exception, match="null token arrays"):
        pack_sequences(df, window=4, group_cols=("source",),
                       id_col="did").collect()


def test_pack_bad_args(spark):
    df = spark.createDataFrame([("a", 1, [1])],
                               "source string, did long, tokens array<int>")
    with pytest.raises(ValueError, match="window"):
        pack_sequences(df, window=0, id_col="did")
    with pytest.raises(ValueError, match="n_shards"):
        pack_sequences(df, window=4, id_col="did", n_shards=0)
    with pytest.raises(ValueError, match="not in DataFrame"):
        pack_sequences(df, window=4, id_col="nope")
