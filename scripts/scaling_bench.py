#!/usr/bin/env python
"""Two-parallelism-level scaling harness (BASELINE.md criterion).

No real cluster exists in this sandbox, so per the driver instruction
the 'N vs 4N executors' criterion is evidenced by running the *same*
encode job on the *same* input at local[8] (N) and local[32] (4N):
input partition count and bucket count are pinned so parallelism is
the only variable. Efficiency = thr(4N) / (4 * thr(N)); target >= 0.8.

Each level runs in a fresh subprocess (fresh JVM) to avoid warm-cache
bias. Results are appended to BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [rows]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, tempfile, time, shutil
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from tokcodec.session import get_spark
from tokcodec.synth import synth_df
from tokcodec.io_tables import write_encoded, encoded_size_bytes

cores = int(sys.argv[1])
rows = int(sys.argv[2])
spark = get_spark(master=f"local[{{cores}}]", app_name=f"scale-{{cores}}",
                  shuffle_partitions=128)
spark.sparkContext.setLogLevel("ERROR")
# pinned: 128 input partitions and 128 buckets at BOTH levels
df = synth_df(spark, rows, seed=42, partitions=128).cache()
tokens = df.agg(F.sum("n_tok")).collect()[0][0]
# warm python workers at both levels so process-spawn cost (amortized
# to zero on a long-lived cluster) doesn't bias the efficiency ratio
from tokcodec.encode import encode_table
from tokcodec.session import warm_python_workers
warm_python_workers(spark)
encode_table(synth_df(spark, cores * 256, seed=1, partitions=cores),
             n_buckets=cores * 4, run_id="warm").count()
wdir = "/dev/shm" if os.path.isdir("/dev/shm") else None
work = tempfile.mkdtemp(prefix=f"scale{{cores}}_", dir=wdir)
dts = []
for rep in range(2):  # best-of-2: damp shared-sandbox noise
    t0 = time.monotonic()
    write_encoded(df, os.path.join(work, f"enc{{rep}}"), n_buckets=128,
                  run_id="scale")
    dts.append(time.monotonic() - t0)
dt = min(dts)
enc_bytes = encoded_size_bytes(os.path.join(work, "enc0"))
shutil.rmtree(work, ignore_errors=True)
spark.stop()
print(json.dumps({{"cores": cores, "rows": rows, "tokens": int(tokens),
                   "seconds": dt, "tokens_per_sec": tokens / dt,
                   "enc_bytes": enc_bytes}}))
"""


def run_level(cores: int, rows: int) -> dict:
    code = WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(rows)],
        capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"level {cores} failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    lo = run_level(8, rows)
    hi = run_level(32, rows)
    eff = hi["tokens_per_sec"] / (4 * lo["tokens_per_sec"])
    result = {
        "rows": rows,
        "tokens": lo["tokens"],
        "local8_tokens_per_sec": int(lo["tokens_per_sec"]),
        "local32_tokens_per_sec": int(hi["tokens_per_sec"]),
        "local8_seconds": round(lo["seconds"], 2),
        "local32_seconds": round(hi["seconds"], 2),
        "scaling_efficiency_8_to_32": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
        "enc_bytes": hi["enc_bytes"],
    }
    print(json.dumps(result))
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    header = not os.path.exists(md)
    with open(md, "a") as f:
        if header:
            f.write(
                "# BENCH/BASELINE — measured scaling results\n\n"
                "Same encode job, same input (128 pinned partitions, 128\n"
                "buckets), two parallelism levels standing in for N and 4N\n"
                "executors (sandbox has no real cluster — driver instruction).\n"
                "Efficiency = thr(local[32]) / (4 x thr(local[8])); "
                "target >= 0.8.\n\n"
                "| when | rows | tokens | tok/s local[8] | tok/s local[32] "
                "| efficiency | pass |\n|---|---|---|---|---|---|---|\n"
            )
        f.write(
            f"| {time.strftime('%Y-%m-%d %H:%M:%S')} | {rows} "
            f"| {result['tokens']} | {result['local8_tokens_per_sec']} "
            f"| {result['local32_tokens_per_sec']} "
            f"| {result['scaling_efficiency_8_to_32']} "
            f"| {'YES' if result['pass'] else 'NO'} |\n"
        )


if __name__ == "__main__":
    main()
