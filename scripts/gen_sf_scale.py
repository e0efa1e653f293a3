#!/usr/bin/env python
"""Scale an existing driver SF dir by an integer factor for LOCAL
performance testing only (the driver generates its own large SF at
measurement time; /root/testdata is read-only and never touched).

Scaling law mirrors the driver's observed behavior across
sf0.01 -> sf0.1: dense surrogate-key domains (custkey, orderkey,
partkey, suppkey, event_id, user_id, doc_id, vec_id) grow with SF,
while value distributions (dates, prices, event timestamps,
event types, text length) stay fixed. Star tables are replicated
with per-replica key offsets so join fan-outs and filter
selectivity FRACTIONS match the source; `documents` and
`embeddings` are re-sampled from the source's empirical
distributions (replicating texts verbatim would mint duplicate
groups the driver's data does not have, distorting the
minhash/dedup workload shape).

Usage: python scripts/gen_sf_scale.py [factor] [src_dir] [dst_dir]
Defaults: 10 /root/testdata/sf0.1 /root/testdata_scaled/sf1.0
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
DST = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata_scaled/sf1.0"

assert not DST.startswith("/root/testdata/"), "never write into the driver's read-only dir"
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
rng = np.random.default_rng(42)


def _src(name: str) -> str:
    return os.path.join(SRC, f"{name}.parquet")


def _dst(name: str) -> str:
    return os.path.join(DST, f"{name}.parquet")


def _key_span(table: str, col: str) -> int:
    # dense 0..N-1 domains: span = max+1 keeps replicas dense and
    # non-overlapping, matching the driver's domain growth with SF
    return con.sql(f"select max({col})+1 from '{_src(table)}'").fetchone()[0]


def replicate(table: str, offsets: dict[str, int]) -> None:
    """Write FACTOR replicas, adding r*span to each offset key column."""
    t = pq.read_table(_src(table))
    reps = []
    for r in range(FACTOR):
        cols = []
        for name in t.column_names:
            arr = t.column(name)
            if name in offsets and r > 0:
                arr = pa.chunked_array(
                    [pa.compute.add(c, offsets[name] * r) for c in arr.chunks]
                )
            cols.append(arr)
        reps.append(pa.table(cols, names=t.column_names))
    pq.write_table(pa.concat_tables(reps), _dst(table),
                   compression="snappy")


def copy(table: str) -> None:
    pq.write_table(pq.read_table(_src(table)), _dst(table),
                   compression="snappy")


def gen_documents() -> None:
    """Re-sample texts: empirical word frequencies + word-count
    distribution from the source corpus (same md5-per-shingle
    workload per row; no artificial duplicate groups)."""
    src = pq.read_table(_src("documents"))
    texts = src.column("text").to_pylist()
    langs = src.column("lang").to_pylist()
    sources = src.column("source").to_pylist()
    words, counts = [], []
    vocab: dict[str, int] = {}
    for tx in texts:
        ws = tx.split(" ")
        counts.append(len(ws))
        for w in ws:
            vocab[w] = vocab.get(w, 0) + 1
    vwords = list(vocab)
    vfreq = np.array([vocab[w] for w in vwords], dtype=np.float64)
    vfreq /= vfreq.sum()
    n = len(texts) * FACTOR
    ncounts = rng.choice(np.array(counts), size=n)
    picks = rng.choice(len(vwords), size=int(ncounts.sum()), p=vfreq)
    out_texts, pos = [], 0
    for c in ncounts:
        out_texts.append(" ".join(vwords[i] for i in picks[pos:pos + c]))
        pos += c
    li = rng.integers(0, len(texts), size=n)
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(out_texts),
        "lang": pa.array([langs[i] for i in li]),
        "source": pa.array([sources[i] for i in li]),
        "n_chars": pa.array(np.array([len(t) for t in out_texts],
                                     dtype=np.int64)),
    })
    pq.write_table(tbl, _dst("documents"), compression="snappy")


def gen_embeddings() -> None:
    src = pq.read_table(_src("embeddings"))
    dim = len(src.column("embedding")[0])
    labels = src.column("label").to_numpy()
    n = src.num_rows * FACTOR
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.ravel()), dim).cast(pa.list_(pa.float32())),
        "label": pa.array(labels[rng.integers(0, len(labels), size=n)]
                          .astype(np.int32)),
    })
    pq.write_table(tbl, _dst("embeddings"), compression="snappy")


def main() -> None:
    cust_span = _key_span("customer", "c_custkey")
    order_span = _key_span("orders", "o_orderkey")
    part_span = _key_span("part", "p_partkey")
    supp_span = _key_span("supplier", "s_suppkey")
    event_span = _key_span("events", "event_id")
    user_span = _key_span("events", "user_id")

    copy("region")
    copy("nation")
    replicate("customer", {"c_custkey": cust_span})
    replicate("supplier", {"s_suppkey": supp_span})
    replicate("part", {"p_partkey": part_span})
    replicate("orders", {"o_orderkey": order_span, "o_custkey": cust_span})
    replicate("lineitem", {"l_orderkey": order_span,
                           "l_partkey": part_span, "l_suppkey": supp_span})
    replicate("events", {"event_id": event_span, "user_id": user_span})
    gen_documents()
    gen_embeddings()
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents",
                 "embeddings"):
        n = con.sql(f"select count(*) from '{_dst(name)}'").fetchone()[0]
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
