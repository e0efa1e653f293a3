#!/usr/bin/env python
"""Benchmark harness (driver contract): headline queries + engine
encode/decode throughput at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "encode_tokens_per_sec": ..., "decode_tokens_per_sec": ...,
   "compression_ratio_vs_snappy": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# synthetic sequences rows scale with sf (sf0.1 -> 200k rows, ~40M tokens)
_SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
SYNTH_ROWS = int(os.environ.get("SPARK_GRAFT_SYNTH_ROWS", str(int(2_000_000 * _SF))))


def _memcpy_probe_gbps(n_bytes: int = 1 << 28) -> float:
    """Single-thread host memory bandwidth right now, GB/s. Recorded
    next to the engine timings so a host-stalled rep is self-evident
    in the artifact (quiet host ~12-16 GB/s single-thread; a shared-
    sandbox stall shows up as a much lower probe)."""
    import numpy as np

    src = np.ones(n_bytes, dtype=np.uint8)
    dst = np.empty_like(src)
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        np.copyto(dst, src)
        best = min(best, time.monotonic() - t0)
    return round(n_bytes / best / 1e9, 2)


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from tokcodec.io_tables import (
        encoded_size_bytes,
        parquet_size_bytes,
        read_encoded,
        write_encoded,
    )
    from tokcodec.session import get_spark
    from tokcodec.synth import synth_df

    spark = get_spark(
        master=f"local[{CPUS}]", app_name="tokcodec-bench",
        shuffle_partitions=max(CPUS, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")
    workdir = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="tokcodec_bench_", dir=workdir)
    timings: dict[str, float] = {}

    # ---------------- engine throughput on the canonical sequences table
    df = synth_df(spark, SYNTH_ROWS, seed=42, partitions=CPUS * 2).cache()
    total_tokens = df.agg(F.sum("n_tok")).collect()[0][0]
    n_buckets = CPUS * 4

    # warm up the Python workers (one-time process spawn + imports —
    # amortized to zero on a long-lived cluster, so excluded from the
    # steady-state throughput measurement), then one small end-to-end
    # encode to JIT the JVM-side plan
    from tokcodec.encode import encode_table
    from tokcodec.session import warm_python_workers

    warm_python_workers(spark)
    warm = synth_df(spark, CPUS * 256, seed=1, partitions=CPUS)
    encode_table(warm, n_buckets=CPUS * 4, run_id="warmup").count()

    # min-of-3 to damp shared-sandbox noise (steady-state throughput is
    # the quantity of interest; round-3 verdict #1: min-of-2 let a
    # host-stalled pair masquerade as a regression). A memcpy bandwidth
    # probe brackets every rep so a degraded host phase is
    # self-diagnosing in the recorded artifact: if probes during a rep
    # read far below the quiet-host ~12-16 GB/s, that rep's wall is
    # host noise, not engine behavior.
    enc_times, dec_times, memcpy_gbps = [], [], [_memcpy_probe_gbps()]
    for rep in range(3):
        enc_path = os.path.join(work, f"enc{rep}")
        t0 = time.monotonic()
        write_encoded(df, enc_path, n_buckets=n_buckets, run_id="bench")
        enc_times.append(round(time.monotonic() - t0, 3))
        t0 = time.monotonic()
        dec = read_encoded(spark, enc_path)
        n_dec = dec.agg(
            F.count("*"), F.sum("n_tok"),
            F.sum(F.expr("aggregate(tokens, 0L, (a, x) -> a + x)")),
        ).collect()[0]
        dec_times.append(round(time.monotonic() - t0, 3))
        assert n_dec[0] == SYNTH_ROWS and n_dec[1] == total_tokens
        memcpy_gbps.append(_memcpy_probe_gbps())
    enc_path = os.path.join(work, "enc0")
    t_encode = min(enc_times)
    t_decode = min(dec_times)

    # the shuffle-free per-bucket reader, same verification aggregate —
    # recorded next to the grouped reader so the artifact shows both
    # read paths' steady state (the direct path wins when the decode
    # shuffle is the bottleneck, e.g. network-bound clusters)
    from tokcodec.io_tables import read_encoded_direct

    dd_times = []
    for _rep in range(2):
        t0 = time.monotonic()
        ddec = read_encoded_direct(spark, enc_path)
        n_dd = ddec.agg(F.count("*"), F.sum("n_tok")).collect()[0]
        dd_times.append(round(time.monotonic() - t0, 3))
        assert n_dd[0] == SYNTH_ROWS and n_dd[1] == total_tokens
    t_decode_direct = min(dd_times)
    timings["encode_sequences"] = round(t_encode, 3)
    timings["decode_sequences"] = round(t_decode, 3)

    ref_path = os.path.join(work, "ref_parquet")
    df.write.mode("overwrite").option("compression", "snappy").parquet(ref_path)
    ratio = encoded_size_bytes(enc_path) / max(parquet_size_bytes(ref_path), 1)

    # -------- FSST fixture: a vocab-style string column (log/word-like
    # data — scattered short symbols, exactly where FSST beats zstd's
    # LZ77 even THROUGH the zstd-1 outer layer; on URL-style long
    # repeats zstd alone wins and the selector's measured trial keeps
    # FSST off — see selector.select_str_codec). Records that the
    # selector actually chose fsst and the size it bought.
    import json as _json

    from pyspark.sql import Row

    vocab = [f"w{i:03d}" + "abcdefgh"[:(i % 5) + 2] for i in range(220)]
    varr = "array(" + ",".join(f"'{w}'" for w in vocab) + ")"
    fs_rows = max(20_000, SYNTH_ROWS // 4)
    fdf = (
        spark.range(fs_rows)
        .select(
            F.col("id").cast("string").alias("doc_id"),
            # hash-based word pick: an affine index mod 220 collapses
            # to id mod 220 (only 220 distinct msgs — parquet dict
            # trivially wins); xxhash64 gives genuinely distinct rows
            F.expr(
                f"array_join(transform(sequence(0, 11), j -> {varr}["
                "cast(pmod(xxhash64(concat(cast(id as string), '-', "
                "cast(j as string))), 220) as int)]), ' ')"
            ).alias("msg"),
        )
    )
    # materialize the fixture BEFORE timing: the 12-hash-per-row
    # synthesis expression is the corpus generator, not the engine
    fdf = fdf.persist()
    fdf.count()
    fsst_path = os.path.join(work, "fsst_enc")
    t0 = time.monotonic()
    write_encoded(fdf, fsst_path, n_buckets=CPUS, run_id="fsst")
    t_fsst = time.monotonic() - t0
    fdf.unpersist()
    lin = spark.read.parquet(os.path.join(fsst_path, "lineage"))
    codec_rows = [_json.loads(r.codecs) for r in lin.select("codecs").collect()]
    msg_codecs = sorted({c.get("msg") for c in codec_rows})
    fsst_ref = os.path.join(work, "fsst_ref")
    fdf.write.mode("overwrite").option("compression", "snappy").parquet(fsst_ref)
    fsst_ratio = encoded_size_bytes(fsst_path) / max(parquet_size_bytes(fsst_ref), 1)
    timings["fsst_vocab_encode"] = round(t_fsst, 3)

    # ------------------------------------------------- headline queries
    headline = [
        "roundtrip_source_agg",
        # late r5: roundtrip_global_checksum merged INTO
        # roundtrip_source_agg (one rollup pass); its bench slot goes
        # to the new element-bloom contamination scan
        "contains_token_scan",
        "roundtrip_lineitem_daterange",
        "roundtrip_variant_extract",
        "roundtrip_lineitem_pricing",
        "join_topcustomers",
        "window_top_order",
        "roundtrip_events_hourly",
        "dedup_exact",
        "emb_cosine_topk",
        "minhash_neardup_pairs",
        "simhash_hamming_hist",
        "roundtrip_time_of_day",
        "media_feature_stats",
        "zorder_user_time_slab",
        # r5 additions (new rows; the r1-r4 subset above is unchanged
        # for round-over-round comparability)
        "pack_sequences",
        "vocab_topk",
        "delete_roundtrip",
        "docs_repetition_stats",
        "cobucket_join_stats",
        # aggregate pushdown (r5): metadata-only corpus stats over
        # ~38M tokens + the day-clustered grouped rollup
        "metadata_rowcount",
        "events_daily_pushdown",
    ]
    qs = entrymod.queries()
    # the heavy LSH pipelines get min-of-3: their multi-second walls
    # are the ones a single host stall distorts most (r4 verdict #2:
    # minhash recorded 5.97 s vs 2.18 s steady with no telemetry to
    # adjudicate)
    REPS = {"minhash_neardup_pairs": 3, "simhash_hamming_hist": 3}
    # memcpy probes BRACKET the query section (and each LSH query), so
    # a host-stalled phase is self-evident in the artifact — same
    # shape the engine rows already have
    query_probes = [_memcpy_probe_gbps()]
    query_reps: dict = {}
    for name in headline:
        # one UNTIMED warmup (plan compilation, query-local caches,
        # python worker reuse), then min-of-N timed reps: round 2's
        # min-of-2 alone recorded a 3x-inflated minhash number because
        # warmup dominated rep 1 while rep 2 hit a host stall
        # (round-2 verdict #6)
        qs[name](spark, SF_DIR).collect()
        reps = []
        for _rep in range(REPS.get(name, 2)):
            t0 = time.monotonic()
            qs[name](spark, SF_DIR).collect()
            reps.append(round(time.monotonic() - t0, 3))
        # per-query rep arrays ride in the artifact so a one-off JVM/
        # GC phase (e.g. a 5 s variant row whose isolated re-measure
        # was 1.5 s) is self-evident without a re-run
        query_reps[name] = reps
        timings[name] = min(reps)
        if name in REPS:
            query_probes.append(_memcpy_probe_gbps())
    query_probes.append(_memcpy_probe_gbps())

    total = sum(timings.values())
    out = {
        "metric": "headline_queries_plus_encode_decode_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": _SF,
        "synth_rows": SYNTH_ROWS,
        "synth_tokens": int(total_tokens),
        "encode_tokens_per_sec": int(total_tokens / t_encode),
        "decode_tokens_per_sec": int(total_tokens / t_decode),
        "encode_rep_secs": enc_times,
        "decode_rep_secs": dec_times,
        "decode_direct_tokens_per_sec": int(total_tokens / t_decode_direct),
        "decode_direct_rep_secs": dd_times,
        "memcpy_probe_gbps": memcpy_gbps,
        "query_memcpy_probe_gbps": query_probes,
        "query_rep_secs": query_reps,
        "compression_ratio_vs_snappy": round(ratio, 4),
        "fsst_vocab": {
            "msg_codecs_chosen": msg_codecs,
            "ratio_vs_snappy": round(fsst_ratio, 4),
            "rows": fs_rows,
        },
        "cpus": CPUS,
    }
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
