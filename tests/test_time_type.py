"""TIME logical type through the engine (reference
impl/write/TimeWrite.java:46-52, LogicalTypeConverters.java:163-171;
round-3 verdict gap #1): Spark 4.1 TimeType crosses Arrow as
time64[ns], stored on the int64 codec lane (nanos since midnight),
with zone-map range filters like any other int-lane column."""

import datetime as dt

from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from tokcodec.io_tables import read_encoded, read_encoded_direct, write_encoded

SCHEMA = T.StructType([
    T.StructField("k", T.IntegerType(), False),
    T.StructField("t", T.TimeType(), True),
    T.StructField("ts", T.ArrayType(T.TimeType(), True), True),
])


def _df(spark):
    rows = [
        Row(k=0, t=dt.time(0, 0, 0), ts=[dt.time(1, 2, 3), None]),
        Row(k=1, t=dt.time(23, 59, 59, 999999), ts=[]),
        Row(k=2, t=None, ts=None),
        Row(k=3, t=dt.time(12, 30, 45, 123456), ts=[dt.time(6, 0)]),
        Row(k=4, t=dt.time(6, 15, 0), ts=[dt.time(23, 0, 0, 1)]),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_time_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    src = _df(spark)
    write_encoded(src, path, n_buckets=2, run_id="r1")
    out = read_encoded(spark, path)
    assert out.schema["t"].dataType == T.TimeType()
    got = {r.k: (r.t, r.ts) for r in out.collect()}
    want = {r.k: (r.t, r.ts) for r in src.collect()}
    assert got == want


def test_time_roundtrip_direct(spark, tmp_path):
    path = str(tmp_path / "t")
    write_encoded(_df(spark), path, n_buckets=2, run_id="r1")
    out = read_encoded_direct(spark, path, columns=["k", "t"])
    got = {r.k: r.t for r in out.collect()}
    assert got[3] == dt.time(12, 30, 45, 123456) and got[2] is None


def test_time_zone_range_filter(spark, tmp_path):
    path = str(tmp_path / "t")
    write_encoded(_df(spark), path, n_buckets=1, run_id="r1",
                  chunk_max_rows=2)
    # bounds as time objects and as ISO strings
    for lo, hi in [(dt.time(6, 0), dt.time(13, 0)), ("06:00:00", "13:00:00")]:
        out = read_encoded(spark, path, range_filter=("t", lo, hi))
        assert {r.k for r in out.collect()} == {3, 4}


def test_time_many_rows_codec_lane(spark, tmp_path):
    """Enough rows for real codec selection on the nanos lane (the
    values are multiples of 1000 — FOR/delta-friendly)."""
    path = str(tmp_path / "t")
    src = spark.range(2000).select(
        F.col("id").cast("int").alias("k"),
        F.make_time(
            (F.col("id") % 24).cast("int"),
            (F.col("id") % 60).cast("int"),
            F.lit(0).cast("decimal(16,6)"),
        ).alias("t"),
    )
    write_encoded(src, path, n_buckets=2, run_id="r1")
    out = read_encoded(spark, path)
    assert out.count() == 2000
    chk = out.select(
        F.sum(F.hour("t") * 3600 + F.minute("t") * 60).alias("s")
    ).collect()[0].s
    want = sum((i % 24) * 3600 + (i % 60) * 60 for i in range(2000))
    assert chk == want
