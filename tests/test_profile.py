"""profile_encoded: per-column data profile from metadata only — value
bounds, null presence, sizes, codec mix, HLL NDV — with no payload
decode and no shuffle. Bounds are checked EXACTLY against the source
DataFrame (zone maps store exact lo/hi on int lanes), strings against
the prefix-bound contract, encrypted columns against the redaction /
with-key contract."""

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from tokcodec.io_tables import profile_encoded, write_encoded

SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
    T.StructField("n_tok", T.IntegerType(), True),
    T.StructField("score", T.DoubleType(), True),
    T.StructField("day", T.DateType(), False),
    T.StructField("price", T.DecimalType(12, 2), False),
])


def _mk(spark, n=200):
    rows = [Row(doc_id=f"doc{i:04d}",
                tokens=[(7 * i + j) % 997 for j in range(5)],
                n_tok=None if i % 10 == 0 else 5,
                score=float(i) / 7.0,
                day=dt.date(2024, 1, 1) + dt.timedelta(days=i % 30),
                price=Decimal(f"{i}.25"))
            for i in range(n)]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("prof") / "tbl")
    write_encoded(_mk(spark), path, n_buckets=4, run_id="p0",
                  sketch_columns=["doc_id", "tokens"])
    return path


def test_profile_int_date_decimal_bounds_exact(spark, table):
    prof = profile_encoded(spark, table)
    assert prof["rows"] == 200
    cols = prof["columns"]
    assert cols["n_tok"]["min"] == 5 and cols["n_tok"]["max"] == 5
    assert not cols["n_tok"]["bounds_are_prefixes"]
    assert cols["day"]["min"] == dt.date(2024, 1, 1)
    assert cols["day"]["max"] == dt.date(2024, 1, 30)
    assert cols["price"]["min"] == Decimal("0.25")
    assert cols["price"]["max"] == Decimal("199.25")
    assert cols["score"]["min"] == 0.0
    assert cols["score"]["max"] == pytest.approx(199 / 7.0)
    # list lane: bounds describe the ELEMENTS (token id range)
    assert cols["tokens"]["element_stats"]
    assert cols["tokens"]["min"] == 0
    assert cols["tokens"]["max"] <= 996


def test_profile_string_prefix_bounds(spark, table):
    cols = profile_encoded(spark, table)["columns"]
    d = cols["doc_id"]
    assert d["bounds_are_prefixes"]
    # prefix bounds bracket the true values
    assert d["min"] <= "doc0000"
    assert d["max"] is None or d["max"] >= "doc0199"[:len(d["max"])]


def test_profile_nulls_and_sizes_and_codecs(spark, table):
    cols = profile_encoded(spark, table)["columns"]
    n = cols["n_tok"]
    # 20 of 200 rows are null; the upper bound counts rows of chunks
    # that carry a validity component
    assert n["null_chunks"] >= 1
    assert 20 <= n["null_rows_upper_bound"] <= 200
    assert cols["day"]["null_chunks"] == 0
    for c in cols.values():
        if c["chunks"]:
            assert c["enc_bytes"] > 0 and c["codecs"]


def test_profile_ndv_from_sketches(spark, table):
    prof = profile_encoded(spark, table, columns=["doc_id", "tokens"])
    ndv = prof["columns"]["doc_id"]["ndv"]
    assert abs(ndv - 200) / 200 < 0.05
    vocab = prof["columns"]["tokens"]["ndv"]
    true_vocab = len({(7 * i + j) % 997
                      for i in range(200) for j in range(5)})
    assert abs(vocab - true_vocab) / true_vocab < 0.05
    # unsketched columns carry no ndv key
    assert "ndv" not in profile_encoded(
        spark, table, columns=["n_tok"])["columns"]["n_tok"]


def test_profile_projection_and_unknown_column(spark, table):
    prof = profile_encoded(spark, table, columns=["day"])
    assert list(prof["columns"]) == ["day"]
    with pytest.raises(ValueError, match="not in encoded table"):
        profile_encoded(spark, table, columns=["nope"])


def test_profile_encrypted_redaction(spark, tmp_path):
    path = str(tmp_path / "enc")
    key = bytes(range(32, 48))
    write_encoded(_mk(spark, 60), path, n_buckets=2, run_id="p0",
                  encryption_key=key, encrypted_columns=["n_tok"],
                  sketch_columns=["doc_id"])
    nokey = profile_encoded(spark, path)["columns"]["n_tok"]
    assert nokey["encrypted"]
    assert nokey["min"] is None and nokey["max"] is None
    withkey = profile_encoded(
        spark, path, encryption_key=key)["columns"]["n_tok"]
    assert withkey["min"] == 5 and withkey["max"] == 5
    # plaintext columns profile fine either way
    assert profile_encoded(
        spark, path)["columns"]["day"]["min"] == dt.date(2024, 1, 1)


def test_profile_cli(spark, table):
    """spark-submit surface: --profile prints JSON with the bounds."""
    import json as _json
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(root, "scripts",
                                      "submit_maintenance.py"),
         "--table", table, "--profile", "day,n_tok"],
        capture_output=True, text=True, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    rep = _json.loads(out.stdout.strip().splitlines()[-1])
    cols = rep["profile"]["columns"]
    assert cols["day"]["min"] == "2024-01-01"
    assert cols["n_tok"]["min"] == 5


def test_profile_exact_nulls_and_sum(spark, tmp_path):
    """r5 SMA stats surface in the profile: exact null_rows and exact
    sum, for scalars and for array<int> elements."""
    from pyspark.sql import functions as F

    from tokcodec.io_tables import profile_encoded, write_encoded

    base = str(tmp_path / "psma")
    df = spark.range(500).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 4 != 0, F.col("id") * 2).alias("v"),
        F.sequence(F.lit(0).cast("int"),
                   (F.col("id") % 5).cast("int")).alias("tokens"))
    write_encoded(df.repartition(1), base, n_buckets=2,
                  chunk_max_rows=64)
    prof = profile_encoded(spark, base)
    want_nulls = df.filter(F.col("v").isNull()).count()
    want_sum = df.agg(F.sum("v")).collect()[0][0]
    assert prof["columns"]["v"]["null_rows"] == want_nulls
    assert prof["columns"]["v"]["sum"] == want_sum
    tok = prof["columns"]["tokens"]
    want_tok = df.select(F.explode("tokens").alias("e")).agg(
        F.sum("e"), F.count(F.lit(1))).collect()[0]
    assert tok["sum"] == want_tok[0]
    assert tok["null_rows"] == 0
    assert prof["columns"]["k"]["sum"] == 500 * 499 // 2
    assert prof["columns"]["k"]["null_rows"] == 0
