"""remap_tokens: vocabulary surgery through compact_encoded's
rewrite-time transform hook — old->new token ids applied vectorized
across the table, committed atomically, with zone maps / element
blooms / codec selection re-derived from the NEW ids."""

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from tokcodec.io_tables import read_encoded, write_encoded
from tokcodec.remap import make_remap_transform, remap_tokens

SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
    T.StructField("n_tok", T.IntegerType(), False),
])


def _mk(spark, n=120, vocab=50):
    return spark.createDataFrame(
        [Row(doc_id=f"d{i:03d}",
             tokens=[(i * 3 + j) % vocab for j in range(4)],
             n_tok=4) for i in range(n)],
        SCHEMA)


def _tok_lists(df):
    return {r.doc_id: list(r.tokens)
            for r in df.select("doc_id", "tokens").collect()}


def test_full_remap_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    src = _mk(spark)
    write_encoded(src, path, n_buckets=3, run_id="r0",
                  bloom_columns=["tokens"])
    mapping = {i: i + 1000 for i in range(50)}
    out = remap_tokens(spark, path, "tokens", mapping)
    assert out["remapped_column"] == "tokens"
    got = _tok_lists(read_encoded(spark, path))
    want = {k: [v + 1000 for v in toks]
            for k, toks in _tok_lists(src).items()}
    assert got == want
    # element blooms were regenerated from the NEW ids: the old id
    # finds nothing, the new id finds its rows
    assert read_encoded(spark, path,
                        contains_filter=("tokens", 0)).count() == 0
    assert read_encoded(spark, path,
                        contains_filter=("tokens", 1000)).count() > 0


def test_unmapped_policies(spark, tmp_path):
    src = _mk(spark, n=40, vocab=10)
    partial = {i: i + 100 for i in range(5)}  # ids 5..9 unmapped

    p1 = str(tmp_path / "err")
    write_encoded(src, p1, n_buckets=2, run_id="r0")
    with pytest.raises(Exception, match="no mapping"):
        remap_tokens(spark, p1, "tokens", partial)  # default: error

    p2 = str(tmp_path / "keep")
    write_encoded(src, p2, n_buckets=2, run_id="r0")
    remap_tokens(spark, p2, "tokens", partial, on_unmapped="keep")
    got = _tok_lists(read_encoded(spark, p2))
    want = {k: [v + 100 if v < 5 else v for v in toks]
            for k, toks in _tok_lists(src).items()}
    assert got == want

    p3 = str(tmp_path / "unk")
    write_encoded(src, p3, n_buckets=2, run_id="r0")
    remap_tokens(spark, p3, "tokens", partial, on_unmapped=-1)
    got = _tok_lists(read_encoded(spark, p3))
    want = {k: [v + 100 if v < 5 else -1 for v in toks]
            for k, toks in _tok_lists(src).items()}
    assert got == want


def test_scalar_int_column_remap(spark, tmp_path):
    path = str(tmp_path / "s")
    write_encoded(_mk(spark), path, n_buckets=2, run_id="r0")
    remap_tokens(spark, path, "n_tok", {4: 44})
    vals = {r.n_tok for r in read_encoded(spark, path).collect()}
    assert vals == {44}


def test_lane_overflow_rejected(spark, tmp_path):
    path = str(tmp_path / "o")
    write_encoded(_mk(spark, n=20, vocab=5), path, n_buckets=1,
                  run_id="r0")
    with pytest.raises(Exception, match="does not fit"):
        remap_tokens(spark, path, "tokens",
                     {i: (1 << 40) + i for i in range(5)})


def test_non_int_column_rejected(spark, tmp_path):
    path = str(tmp_path / "n")
    write_encoded(_mk(spark, n=10), path, n_buckets=1, run_id="r0")
    with pytest.raises(ValueError, match="int or array<int>"):
        remap_tokens(spark, path, "doc_id", {1: 2})


def test_transform_hook_preserves_nulls(spark):
    """Null lists and null elements pass through the hook untouched."""
    import pyarrow as pa

    hook = make_remap_transform("tokens", {1: 11, 2: 22},
                                on_unmapped="keep")
    batch = pa.RecordBatch.from_pydict({
        "doc_id": ["a", "b", "c"],
        "tokens": pa.array([[1, None, 2], None, [3]],
                           type=pa.list_(pa.int32())),
    })
    out = hook(batch)
    assert out.column(1).to_pylist() == [[11, None, 22], None, [3]]


def test_sparse_mapping_path(spark):
    """Wide-spread old ids take the sorted binary-search path."""
    import pyarrow as pa

    mapping = {10: 1, 10_000_000_000: 2, 7: 3}
    hook = make_remap_transform("t", mapping)
    batch = pa.RecordBatch.from_pydict({
        "t": pa.array([[10, 7], [10_000_000_000]],
                      type=pa.list_(pa.int64()))})
    assert hook(batch).column(0).to_pylist() == [[1, 3], [2]]


def test_remap_cli(spark, tmp_path):
    """spark-submit surface: --remap-column with a parquet mapping."""
    import json as _json
    import os
    import subprocess
    import sys

    path = str(tmp_path / "cli")
    write_encoded(_mk(spark, n=30, vocab=8), path, n_buckets=2,
                  run_id="r0")
    mp = str(tmp_path / "map")
    spark.createDataFrame([(i, i + 500) for i in range(8)],
                          "old int, new int").write.parquet(mp)
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(root, "scripts",
                                      "submit_maintenance.py"),
         "--table", path, "--remap-column", "tokens",
         "--remap-parquet", mp],
        capture_output=True, text=True, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    rep = _json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["remap"]["mapping_size"] == 8
    toks = {v for r in read_encoded(spark, path)
            .select(F.explode("tokens")).collect() for v in r}
    assert toks <= {i + 500 for i in range(8)}
