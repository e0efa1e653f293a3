#!/usr/bin/env python
"""Round-6 encode-path profiling (guide §1: measure first).

Part A (no Spark): cProfile make_encode_fn over one synthetic bucket —
where does encode CPU go (stats/selector vs pack vs zstd vs arrow)?

Part B (Spark): phase split of write_encoded at bench shape —
  b1: shuffle+sort+arrow round-trip only (passthrough mapInArrow)
  b2: shuffle+sort+encode (no file writes)
  b3: full write_encoded (encode + block file writes)
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODE = sys.argv[1] if len(sys.argv) > 1 else "a"
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000


def part_a():
    import pyarrow as pa

    from tokcodec.encode import make_encode_fn
    from tokcodec.schema import SEQ_SCHEMA
    from tokcodec.synth import synth_arrow

    rows = min(ROWS, 100_000)
    t = synth_arrow(rows, seed=42)
    fn = make_encode_fn(SEQ_SCHEMA, "prof")
    fn((0,), t)  # warm numpy/zstd
    pr = cProfile.Profile()
    t0 = time.monotonic()
    pr.enable()
    out = fn((0,), t)
    pr.disable()
    wall = time.monotonic() - t0
    ntok = pa.compute.sum(t.column("n_tok")).as_py()
    print(f"rows={rows} tokens={ntok} wall={wall:.3f}s "
          f"({ntok / wall / 1e6:.1f} M tok/s single-core)")
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(30)
    print(s.getvalue())
    print("out rows:", out.num_rows)


def part_b():
    from pyspark.sql import functions as F

    from tokcodec.encode import BUCKET_COL, with_bucket
    from tokcodec.io_tables import write_encoded
    from tokcodec.session import get_spark, warm_python_workers
    from tokcodec.synth import synth_df

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", app_name="prof_enc",
                      shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")
    df = synth_df(spark, ROWS, seed=42, partitions=cpus * 2).cache()
    df.count()
    warm_python_workers(spark)
    n_buckets = cpus * 4
    n_tasks = cpus * 2

    def passthrough(batches):
        import pyarrow as pa
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [pa.array([batch.num_rows])], names=["n"])

    import tempfile

    for rep in range(3):
        b = with_bucket(df, n_buckets)
        spark.sparkContext.setJobDescription(f"b1 shuffle+sort only {rep}")
        t0 = time.monotonic()
        (b.repartition(n_tasks, F.col(BUCKET_COL))
         .sortWithinPartitions(BUCKET_COL)
         .mapInArrow(passthrough, "n long").agg(F.sum("n")).collect())
        t1 = time.monotonic() - t0

        spark.sparkContext.setJobDescription(f"b3 full write {rep}")
        work = tempfile.mkdtemp(prefix="prof_enc_", dir="/dev/shm")
        t0 = time.monotonic()
        write_encoded(df, os.path.join(work, "t"), n_buckets=n_buckets,
                      run_id="prof")
        t3 = time.monotonic() - t0
        import shutil
        shutil.rmtree(work, ignore_errors=True)
        print(f"rep{rep}: shuffle+sort+arrow={t1:.3f}s "
              f"full_write={t3:.3f}s  encode+write_delta={t3 - t1:.3f}s",
              flush=True)
    spark.stop()


if MODE == "a":
    part_a()
else:
    part_b()
