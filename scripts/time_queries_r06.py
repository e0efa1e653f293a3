#!/usr/bin/env python
"""Time individual registry queries at a given SF dir (bench.py's
methodology: one untimed warmup, then min-of-N timed reps). For
engine-internal comparisons where the round-5 baseline lives in
BENCH_r05.json rather than in the baseline entry module."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
NAMES = sys.argv[2:]
REPS = int(os.environ.get("REPS", "2"))


def main():
    from tokcodec.session import get_spark, warm_python_workers

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", app_name="time_r06",
                      shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark)
    import __spark_entry__ as E

    qs = E.queries()
    for name in NAMES:
        q = qs[name]
        spark.sparkContext.setJobDescription(f"{name} warm")
        q(spark, SF_DIR).collect()
        reps = []
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(name)
            t0 = time.monotonic()
            q(spark, SF_DIR).collect()
            reps.append(round(time.monotonic() - t0, 3))
        print(f"{name:32s} min={min(reps):7.3f}s reps={reps}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
