#!/usr/bin/env python
"""Write plans/r06/<query>_{before,after}.txt — explain('formatted')
of every round-6-touched query, from the round-5 baseline module
(/tmp/entry_baseline_r05.py, checked out from git if absent) and the
current one. The judge reads these instead of running Spark."""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(REPO, "plans", "r06")
BASELINE = "/tmp/entry_baseline_r05.py"
BASELINE_REF = "3cf369a"  # round-5 final commit

QUERIES = sys.argv[1:] or [
    "minhash_neardup_pairs", "simhash_hamming_hist",
    "docs_repetition_stats", "docs_text_quality", "docs_langid",
    "dedup_exact", "docs_fingerprints", "emb_cosine_topk",
    "pipeline_keep_set", "contains_token_scan",
    "roundtrip_variant_extract", "zorder_user_time_slab",
    "roundtrip_lineitem_daterange", "delete_roundtrip",
    "events_daily_pushdown", "roundtrip_source_agg",
    "join_topcustomers", "events_json_extract",
]


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main():
    os.makedirs(OUT, exist_ok=True)
    if not os.path.exists(BASELINE):
        src = subprocess.check_output(
            ["git", "-C", REPO, "show",
             f"{BASELINE_REF}:__spark_entry__.py"], text=True)
        with open(BASELINE, "w") as f:
            f.write(src)
    from tokcodec.session import get_spark, warm_python_workers

    spark = get_spark(master="local[32]", app_name="plans_r06")
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark)
    base = _load("entry_base_plans", BASELINE)
    new = _load("entry_new_plans",
                os.path.join(REPO, "__spark_entry__.py"))
    for name in QUERIES:
        for tag, mod in (("before", base), ("after", new)):
            df = mod.queries()[name](spark, SF_DIR)
            with open(os.path.join(OUT, f"{name}_{tag}.txt"), "w") as f:
                f.write(f"-- {name} [{tag}] sf_dir={SF_DIR}\n")
                f.write(_explain(df))
            print(f"wrote {name}_{tag}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
