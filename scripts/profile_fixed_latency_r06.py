#!/usr/bin/env python
"""Split driver-side planning (DataFrame construction: manifest read,
zone/bloom pruning, file-plan assembly — all Python on the driver)
from cluster execution (.collect()) for the fixed-latency-bound
read queries. Guide §1/§5: if planning dominates, the win is
driver-side, not in the job."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
NAMES = sys.argv[2:] or [
    "zorder_user_time_slab", "roundtrip_variant_extract",
    "cobucket_join_stats", "metadata_rowcount",
    "roundtrip_lineitem_daterange", "contains_token_scan",
    "roundtrip_lineitem_pricing", "delete_roundtrip",
]


def main():
    from tokcodec.session import get_spark, warm_python_workers

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", app_name="prof_fixed",
                      shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark)
    import __spark_entry__ as E

    qs = E.queries()
    for name in NAMES:
        q = qs[name]
        q(spark, SF_DIR).collect()  # warmup: builds cached tables
        plans, execs = [], []
        for _ in range(3):
            t0 = time.monotonic()
            df = q(spark, SF_DIR)
            t1 = time.monotonic()
            df.collect()
            t2 = time.monotonic()
            plans.append(round(t1 - t0, 3))
            execs.append(round(t2 - t1, 3))
        print(f"{name:32s} plan={min(plans):6.3f}s exec={min(execs):6.3f}s "
              f"(plans {plans} execs {execs})", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
