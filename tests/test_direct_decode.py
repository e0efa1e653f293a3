"""Shuffle-free direct decode must agree with the groupBy decode on
projections, multi-epoch tables, and uuid expansion."""

import os

from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from tokcodec.io_tables import read_encoded, read_encoded_direct, write_encoded

SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
    T.StructField("n_tok", T.IntegerType(), False),
    T.StructField("source", T.StringType(), False),
])


def _mk(spark, lo, hi):
    return spark.createDataFrame(
        [Row(doc_id=f"d{i}", tokens=[i, i + 1], n_tok=2,
             source=f"s{i % 3}") for i in range(lo, hi)], SCHEMA)


def _sorted_rows(df):
    return sorted(
        (tuple(r) for r in df.collect()), key=lambda t: t[0]
    )


def test_direct_equals_grouped(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    write_encoded(_mk(spark, 0, 200), path, n_buckets=4, run_id="r1",
                  epoch=0, chunk_max_rows=32)
    write_encoded(_mk(spark, 200, 300), path, n_buckets=4, run_id="r2",
                  epoch=1, chunk_max_rows=32)
    a = _sorted_rows(read_encoded(spark, path))
    b = _sorted_rows(read_encoded_direct(spark, path))
    assert a == b and len(a) == 300
    # no shuffle exchange in the direct plan (only the tiny bucket-id
    # repartition feeds the readers)
    plan = read_encoded_direct(spark, path)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Scan parquet" not in plan  # payloads never enter a Spark scan


def test_direct_projection(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t2")
    write_encoded(_mk(spark, 0, 100), path, n_buckets=2, run_id="r1")
    d = read_encoded_direct(spark, path, columns=["doc_id", "n_tok"])
    assert d.columns == ["doc_id", "n_tok"]
    assert d.count() == 100
    assert d.agg(F.sum("n_tok")).collect()[0][0] == 200


def test_direct_uuid_expansion(spark, tmp_path):
    import uuid as uuidlib

    us = [str(uuidlib.UUID(int=i * 7919 + 3)) for i in range(40)]
    df = spark.createDataFrame(
        [Row(id=u, n=i) for i, u in enumerate(us)], "id string, n int")
    path = os.path.join(str(tmp_path), "t3")
    write_encoded(df, path, n_buckets=2, run_id="u", uuid_columns=["id"])
    out = {r["n"]: r["id"] for r in read_encoded_direct(spark, path).collect()}
    for i, u in enumerate(us):
        assert out[i] == u
