#!/usr/bin/env python
"""Round-6 A/B harness: prove optimized queries return IDENTICAL rows
to the round-5 baseline (/tmp/entry_baseline_r05.py) and compare
per-query wall time in the same session.

Usage: python scripts/ab_r06.py SF_DIR query1 query2 ...
       (query name 'ALL' = every query in the registry)
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
NAMES = sys.argv[2:] or ["ALL"]


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def canon(rows):
    def key(r):
        return tuple("\0N" if v is None else str(v) for v in r)
    return sorted([tuple(r) for r in rows], key=key)


def main():
    if not os.path.exists("/tmp/entry_baseline_r05.py"):
        import subprocess

        src = subprocess.check_output(
            ["git", "-C", os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
             "show", "3cf369a:__spark_entry__.py"], text=True)
        with open("/tmp/entry_baseline_r05.py", "w") as f:
            f.write(src)
    from tokcodec.session import get_spark, warm_python_workers

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", app_name="ab_r06")
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark)

    base = _load("entry_base", "/tmp/entry_baseline_r05.py")
    new = _load("entry_new", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "__spark_entry__.py"))

    names = NAMES
    if names == ["ALL"]:
        names = list(new.queries().keys())

    fails = []
    for name in names:
        res = {}
        times = {}
        for tag, mod in (("base", base), ("new", new)):
            q = mod.queries()[name]
            spark.sparkContext.setJobDescription(f"{name} [{tag}] warm")
            q(spark, SF_DIR).collect()  # warmup (build caches/tables)
            reps = []
            out = None
            for _ in range(2):
                spark.sparkContext.setJobDescription(f"{name} [{tag}]")
                t0 = time.monotonic()
                out = q(spark, SF_DIR).collect()
                reps.append(time.monotonic() - t0)
            res[tag] = canon(out)
            times[tag] = min(reps)
        ok = res["base"] == res["new"]
        if not ok:
            fails.append(name)
        print(f"{name:32s} match={str(ok):5s} "
              f"base={times['base']:7.3f}s new={times['new']:7.3f}s "
              f"x{times['base'] / max(times['new'], 1e-9):5.2f}",
              flush=True)
        if not ok:
            b, n = res["base"], res["new"]
            print(f"  base rows={len(b)} new rows={len(n)}")
            for i, (rb, rn) in enumerate(zip(b, n)):
                if rb != rn:
                    print(f"  first diff @{i}:\n   base={rb}\n   new ={rn}")
                    break
    print("FAILED:" if fails else "ALL MATCH", fails, flush=True)
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
