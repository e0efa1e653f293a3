"""join_runtime_filtered — the encoded layout's DPP analogue: the dim
side's surviving keys prune fact chunks (zones/blooms) before decode.
Soundness bar: result == Spark's own join over the fully decoded
fact, for every key type and fallback shape."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from tokcodec.io_tables import explain_scan, read_encoded, write_encoded
from tokcodec.joins import join_runtime_filtered


def _sorted(df):
    return sorted((tuple(map(str, r)) for r in df.collect()), key=repr)


@pytest.fixture(scope="module")
def fact(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("rtf") / "fact")
    df = spark.range(2000).select(
        (F.col("id") % 100).cast("long").alias("cust"),
        F.col("id").alias("k"),
        (F.col("id") * 3).alias("v"),
        F.concat(F.lit("u"), (F.col("id") % 100)).alias("cust_s"),
    )
    # cluster by cust => tight zones; blooms on the string key
    write_encoded(df.repartition(1), base, n_buckets=4,
                  chunk_max_rows=128, cluster_by="cust",
                  bloom_columns=["cust_s"])
    yield spark, base, df
    shutil.rmtree(base, ignore_errors=True)


def test_inner_matches_spark_join(fact):
    spark, base, df = fact
    dim = spark.createDataFrame(
        [(3, "a"), (41, "b"), (77, "c")], "cust long, tag string")
    st = {}
    got = join_runtime_filtered(spark, base, dim, "cust",
                                stats_out=st)
    want = df.join(dim, ["cust"], "inner")
    assert _sorted(got.select(*sorted(got.columns))) \
        == _sorted(want.select(*sorted(got.columns)))
    assert st["pruning"] == "zone" and st["keys"] == 3
    # the key set really prunes: the same probe through explain_scan
    ex = explain_scan(spark, base, in_filter=("cust", [3, 41, 77]))
    assert ex["chunks_scanned"] < ex["chunks_total"]


def test_left_semi_and_key_pair(fact):
    spark, base, df = fact
    dim = spark.createDataFrame([(5,), (9,)], "c long")
    got = join_runtime_filtered(spark, base, dim, ("cust", "c"),
                                how="left_semi")
    want = df.join(dim.withColumnRenamed("c", "cust"),
                   ["cust"], "left_semi")
    assert _sorted(got.select(*sorted(got.columns))) \
        == _sorted(want.select(*sorted(got.columns)))


def test_string_key_uses_blooms(fact):
    spark, base, df = fact
    dim = spark.createDataFrame([("u7", 1), ("u55", 2)],
                                "cust_s string, w int")
    st = {}
    got = join_runtime_filtered(spark, base, dim, "cust_s",
                                stats_out=st)
    want = df.join(dim, ["cust_s"], "inner")
    assert _sorted(got.select(*sorted(got.columns))) \
        == _sorted(want.select(*sorted(got.columns)))
    assert st["pruning"] == "zone+bloom"


def test_empty_dim_short_circuits(fact):
    spark, base, _df = fact
    dim = spark.createDataFrame([], "cust long, tag string")
    got = join_runtime_filtered(spark, base, dim, "cust")
    assert got.count() == 0


def test_null_dim_keys_never_match(fact):
    spark, base, df = fact
    dim = spark.createDataFrame([(None,), (8,)], "cust long")
    got = join_runtime_filtered(spark, base, dim, "cust")
    want = df.join(dim.filter(F.col("cust").isNotNull()),
                   ["cust"], "inner")
    assert got.count() == want.count()


def test_max_keys_fallback_still_correct(fact):
    spark, base, df = fact
    dim = spark.createDataFrame([(i,) for i in range(50)],
                                "cust long")
    st = {}
    got = join_runtime_filtered(spark, base, dim, "cust",
                                max_keys=10, stats_out=st)
    assert st["pruning"] == "none"
    want = df.join(dim, ["cust"], "inner")
    assert got.count() == want.count()


def test_outer_shapes_rejected(fact):
    spark, base, _df = fact
    dim = spark.createDataFrame([(1,)], "cust long")
    with pytest.raises(ValueError, match="inner/left_semi"):
        join_runtime_filtered(spark, base, dim, "cust", how="left")


def test_projection_and_column_collision(fact):
    spark, base, df = fact
    dim = spark.createDataFrame([(3, 1)], "c long, v int")
    with pytest.raises(ValueError, match="already has a column"):
        # dim carries a 'cust' column AND maps c->cust
        join_runtime_filtered(
            spark, base,
            dim.withColumn("cust", F.lit(0)), ("cust", "c"))
    got = join_runtime_filtered(spark, base, dim.select("c"),
                                ("cust", "c"),
                                fact_columns=["cust", "k"])
    assert set(got.columns) == {"cust", "k"}
    assert got.count() == df.filter(F.col("cust") == 3).count()


def test_date_key_runtime_filter(spark, tmp_path):
    import datetime as dt

    base = str(tmp_path / "dkey")
    df = spark.range(365).select(
        F.date_add(F.lit("2024-01-01").cast("date"),
                   F.col("id").cast("int")).alias("day"),
        (F.col("id") * 5).alias("v"))
    write_encoded(df.repartition(1), base, n_buckets=2,
                  chunk_max_rows=32, cluster_by="day")
    dim = spark.createDataFrame(
        [(dt.date(2024, 3, 1),), (dt.date(2024, 7, 4),)], "day date")
    st = {}
    got = join_runtime_filtered(spark, base, dim, "day", stats_out=st)
    assert st["pruning"] == "zone"
    want = df.join(dim, ["day"], "inner")
    assert _sorted(got.select(*sorted(got.columns))) \
        == _sorted(want.select(*sorted(got.columns)))
    ex = explain_scan(spark, base,
                      in_filter=("day", [dt.date(2024, 3, 1),
                                         dt.date(2024, 7, 4)]))
    assert ex["chunks_scanned"] < ex["chunks_total"]


def test_string_probe_hull_collapse(fact):
    """>64 scattered string probes collapse to the lexical hull —
    pruning coarsens, results stay exact."""
    spark, base, df = fact
    probes = [f"u{i}" for i in range(0, 200)]  # > _MAX_ZONE_TERMS
    got = read_encoded(spark, base, in_filter=("cust_s", probes))
    want = df.filter(F.col("cust_s").isin(probes))
    assert got.count() == want.count() > 0


def test_fact_columns_without_key(fact):
    """Review fix: projecting the key column away must not break the
    join — the key is read internally and dropped from the output."""
    spark, base, df = fact
    dim = spark.createDataFrame([(3,), (41,)], "cust long")
    got = join_runtime_filtered(spark, base, dim, "cust",
                                fact_columns=["v", "k"])
    assert set(got.columns) == {"v", "k"}
    want = df.filter(F.col("cust").isin(3, 41))
    assert got.count() == want.count() > 0
    # the fallback (max_keys) and empty-dim branches too
    got2 = join_runtime_filtered(spark, base, dim, "cust",
                                 fact_columns=["v"], max_keys=1)
    assert set(got2.columns) == {"v"}
    assert got2.count() == want.count()
    empty = spark.createDataFrame([], "cust long")
    got3 = join_runtime_filtered(spark, base, empty, "cust",
                                 fact_columns=["v"])
    assert got3.count() == 0 and set(got3.columns) == {"v"}
