"""Zone-map chunk skipping (encoded-block analogue of parquet
row-group pruning; PAPERS.md Global Range Encoding idea)."""

import pytest
from pyspark.sql import functions as F

from tokcodec import read_encoded, write_encoded
from tokcodec.synth import synth_df


@pytest.fixture(scope="module")
def enc(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("zones") / "enc")
    # cluster within buckets by n_tok so chunks get disjoint ranges
    # (the column-permutation idea from the SIGMOD 2020 RLE paper:
    # clustering makes zone maps selective). CHUNK_MAX_VALUES splits
    # each ~10k-row bucket into several chunks via the token budget.
    df = synth_df(spark, 20_000, seed=21, partitions=8)
    write_encoded(df, path, n_buckets=2, run_id="r1", cluster_by="n_tok",
                  chunk_max_values=1 << 19)  # several chunks per bucket
    return path, df


def test_range_filter_correct(spark, enc):
    path, df = enc
    lo, hi = 100, 200
    got = read_encoded(spark, path, range_filter=("n_tok", lo, hi))
    expect = df.filter((F.col("n_tok") >= lo) & (F.col("n_tok") <= hi))
    assert got.count() == expect.count()
    assert got.select(F.sum("n_tok")).collect()[0][0] == \
        expect.select(F.sum("n_tok")).collect()[0][0]


def test_range_filter_prunes_chunks(spark, enc):
    path, _ = enc
    from tokcodec.schema import BLOCK_DDL

    blocks = spark.read.schema(BLOCK_DDL).option(
        "recursiveFileLookup", "true").parquet(path + "/blocks")
    total_chunks = blocks.filter(
        (F.col("column") == "n_tok") & (F.col("component") == "values")
    ).count()
    surviving = blocks.filter(
        (F.col("column") == "n_tok") & (F.col("component") == "values")
        & (F.get_json_object("meta", "$.hi").cast("long") >= 4000)
        & (F.get_json_object("meta", "$.lo").cast("long") <= 99999)
    ).count()
    # high-n_tok tail lives in few chunks after the n_tok sort
    assert surviving < total_chunks, (surviving, total_chunks)
    got = read_encoded(spark, path, range_filter=("n_tok", 4000, 99999))
    assert got.filter(F.col("n_tok") < 4000).count() == 0


def test_empty_range(spark, enc):
    path, _ = enc
    got = read_encoded(spark, path, range_filter=("n_tok", 10**7, 10**8))
    assert got.count() == 0