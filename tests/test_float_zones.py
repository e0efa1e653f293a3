"""Float/double zone maps: parquet float column-stats analogue —
range_filter pruning on quality scores/probabilities, the float gates
of a curation pipeline. NaNs never satisfy the residual, so pruning
over the finite per-chunk range is sound; chunks holding ±inf carry
no stats and always survive."""

import math

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from tokcodec import read_encoded, read_encoded_direct, write_encoded

SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("score", T.DoubleType(), True),
    T.StructField("score32", T.FloatType(), True),
])


@pytest.fixture(scope="module")
def enc(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fzones") / "enc")
    rows = [Row(doc_id=f"d{i}", score=i / 1000.0, score32=float(i % 50))
            for i in range(8000)]
    df = spark.createDataFrame(rows, SCHEMA)
    # cluster by score so chunks carry tight disjoint float ranges
    write_encoded(df, path, n_buckets=2, run_id="r1",
                  cluster_by="score", chunk_max_rows=1000)
    return path, df


def test_float_range_correct_both_readers(spark, enc):
    path, df = enc
    lo, hi = 0.25, 0.5
    expect = df.filter((F.col("score") >= lo) & (F.col("score") <= hi))
    got = read_encoded(spark, path, range_filter=("score", lo, hi))
    assert got.count() == expect.count()
    gotd = read_encoded_direct(spark, path,
                               range_filter=("score", lo, hi))
    assert gotd.count() == expect.count()
    assert got.agg(F.sum("score")).collect()[0][0] == pytest.approx(
        expect.agg(F.sum("score")).collect()[0][0])


def test_float_zone_prunes_chunks(spark, enc):
    path, _ = enc
    from tokcodec.schema import BLOCK_DDL

    blocks = spark.read.schema(BLOCK_DDL).option(
        "recursiveFileLookup", "true").parquet(path + "/blocks")
    vals = blocks.filter((F.col("column") == "score")
                         & (F.col("component") == "values"))
    total = vals.count()
    surviving = vals.filter(
        (F.get_json_object("meta", "$.hi").cast("double") >= 7.0)
        & (F.get_json_object("meta", "$.lo").cast("double") <= 8.0)
    ).count()
    # the [7, 8] slab lives in a few clustered chunks
    assert 0 < surviving < total, (surviving, total)
    got = read_encoded(spark, path, range_filter=("score", 7.0, 8.0))
    assert got.filter(F.col("score") < 7.0).count() == 0


def test_float32_column_and_in_filter(spark, enc):
    path, df = enc
    got = read_encoded(spark, path, range_filter=("score32", 10.0, 12.0))
    expect = df.filter((F.col("score32") >= 10.0)
                       & (F.col("score32") <= 12.0))
    assert got.count() == expect.count()


def test_nan_and_inf_handling(spark, tmp_path):
    path = str(tmp_path / "nan")
    rows = ([Row(doc_id=f"a{i}", score=float(i), score32=1.0)
             for i in range(100)]
            + [Row(doc_id="nan1", score=float("nan"), score32=1.0),
               Row(doc_id="inf1", score=float("inf"), score32=1.0)])
    df = spark.createDataFrame(rows, SCHEMA)
    write_encoded(df, path, n_buckets=1, run_id="r1")
    got = read_encoded(spark, path, range_filter=("score", 10.0, 20.0))
    ids = {r.doc_id for r in got.collect()}
    # NaN and inf rows excluded by the residual, finite slab exact
    assert ids == {f"a{i}" for i in range(10, 21)}
    # the chunk holds +inf => no zone stats were written (always
    # survives, never mis-prunes)
    from tokcodec.schema import BLOCK_DDL
    import json as _json

    blocks = spark.read.schema(BLOCK_DDL).option(
        "recursiveFileLookup", "true").parquet(path + "/blocks")
    metas = [_json.loads(r.meta) for r in blocks.filter(
        (F.col("column") == "score") & (F.col("component") == "values")
    ).collect()]
    assert all("lo" not in m for m in metas)
    # all-finite chunks DO carry stats (score32 lane)
    metas32 = [_json.loads(r.meta) for r in blocks.filter(
        (F.col("column") == "score32") & (F.col("component") == "values")
    ).collect()]
    assert any("lo" in m and math.isfinite(m["lo"]) for m in metas32)
