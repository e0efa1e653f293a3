#!/usr/bin/env python
"""Interleaved A/B: write_encoded wall with spark.shuffle.compress
on vs off (RAM-backed /dev/shm shuffle dirs). Child mode runs N reps
in one fresh JVM and prints times; parent interleaves A/B/A/B."""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("ROWS", "2000000"))
REPS = int(os.environ.get("REPS", "2"))


def child(compress: str):
    import shutil
    import tempfile

    from pyspark.sql import SparkSession

    from tokcodec.io_tables import write_encoded
    from tokcodec.session import warm_python_workers
    from tokcodec.synth import synth_df

    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab_shufc")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.shuffle.compress", compress)
        .config("spark.shuffle.spill.compress", compress)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = synth_df(spark, ROWS, seed=42, partitions=64).cache()
    df.count()
    warm_python_workers(spark)
    write_encoded(df, tempfile.mkdtemp(dir="/dev/shm") + "/w",
                  n_buckets=128, run_id="warm")
    times = []
    for _ in range(REPS):
        work = tempfile.mkdtemp(prefix="ab_shufc_", dir="/dev/shm")
        t0 = time.monotonic()
        write_encoded(df, os.path.join(work, "t"), n_buckets=128,
                      run_id="x")
        times.append(round(time.monotonic() - t0, 3))
        shutil.rmtree(work, ignore_errors=True)
    print("TIMES", compress, times, flush=True)
    spark.stop()


def parent():
    res = {"true": [], "false": []}
    for _round in range(3):
        for c in ("true", "false"):
            out = subprocess.run(
                [sys.executable, __file__, "--child", c],
                capture_output=True, text=True, timeout=900)
            for ln in out.stdout.splitlines():
                if ln.startswith("TIMES"):
                    _, cc, ts = ln.split(" ", 2)
                    res[cc] += eval(ts)
                    print(ln, flush=True)
    for c, ts in res.items():
        print(f"compress={c}: min={min(ts):.3f} median="
              f"{sorted(ts)[len(ts) // 2]:.3f} all={sorted(ts)}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2])
    else:
        parent()
