"""Z-order (Morton) multi-column clustering: cluster_by=[a, b] makes
chunk zone maps tight in BOTH dimensions, so range filters on EITHER
column prune chunks — the Iceberg/Delta rewrite_data_files Z-order
option, executed per bucket at encode time."""

import numpy as np
import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from tokcodec.encode import _zorder_key
from tokcodec.io_tables import read_encoded, write_encoded
from tokcodec.schema import BLOCK_DDL

import pyarrow as pa


def test_morton_key_interleaves():
    a = pa.array(np.array([0, 1, 0, 3], dtype=np.int64))
    b = pa.array(np.array([0, 0, 1, 3], dtype=np.int64))
    z = _zorder_key([a, b])
    # (0,0)=0b00, (1,0)=0b10, (0,1)=0b01, (3,3)=0b1111
    assert list(z) == [0, 2, 1, 15]


def test_morton_3d_and_validation():
    a = pa.array(np.array([0, 1], dtype=np.int64))
    z3 = _zorder_key([a, a, a])
    assert list(z3) == [0, 0b111]
    with pytest.raises(ValueError, match="2 or 3"):
        _zorder_key([a])
    with pytest.raises(ValueError, match="int-lane"):
        _zorder_key([pa.array([1.5, 0.0]), pa.array([2.5, 0.0])])


def test_zorder_key_handles_negative_and_wide_ranges():
    a = pa.array(np.array([-1000, 0, 1000], dtype=np.int64))
    b = pa.array(np.array([1 << 40, 0, 1 << 41], dtype=np.int64))
    z = _zorder_key([a, b])  # offset-to-min + shift-to-fit, no overflow
    assert len(set(z.tolist())) == 3


@pytest.fixture(scope="module")
def grid(spark, tmp_path_factory):
    """A 64x64 (x, y) grid in ONE bucket, tiny chunks: Z-order should
    give each 256-row chunk a tight square-ish zone in both dims."""
    path = str(tmp_path_factory.mktemp("zo") / "t")
    rows = [Row(doc_id=f"d{i:05d}", x=i % 64, y=i // 64, payload=i)
            for i in range(64 * 64)]
    df = spark.createDataFrame(
        rows, T.StructType([
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("x", T.IntegerType(), False),
            T.StructField("y", T.IntegerType(), False),
            T.StructField("payload", T.IntegerType(), False)]))
    write_encoded(df, path, n_buckets=1, run_id="z1",
                  cluster_by=["x", "y"], chunk_max_rows=256)
    return path


def _surviving(spark, path, col, lo, hi):
    blocks = spark.read.schema(BLOCK_DDL).option(
        "recursiveFileLookup", "true").parquet(path + "/blocks")
    vals = blocks.filter((F.col("column") == col)
                         & (F.col("component") == "values"))
    total = vals.count()
    surv = vals.filter(
        (F.get_json_object("meta", "$.hi").cast("long") >= lo)
        & (F.get_json_object("meta", "$.lo").cast("long") <= hi)).count()
    return surv, total

def test_zorder_prunes_both_dimensions(spark, grid):
    # 16 chunks of 256 rows over a 64x64 grid -> each chunk is a
    # 16x16 Morton tile: a 1/4-width slab in EITHER dim keeps only
    # the 4-of-16 tiles it intersects
    for col in ("x", "y"):
        surv, total = _surviving(spark, grid, col, 0, 15)
        assert total == 16, total
        assert surv == 4, (col, surv, total)
    # single-column clustering would leave the OTHER column's zones
    # full-range: every chunk survives a y-slab
    # (sanity: correctness of the filtered reads)
    got = read_encoded(spark, grid, range_filter=("y", 0, 15))
    assert got.count() == 64 * 16
    assert got.filter(F.col("y") > 15).count() == 0
    got2 = read_encoded(spark, grid, range_filter=("x", 48, 63))
    assert got2.count() == 64 * 16


def test_single_column_clustering_unchanged(spark, tmp_path):
    """list-of-one degrades to the plain sort path."""
    df = spark.createDataFrame(
        [Row(doc_id=f"d{i}", v=i % 10) for i in range(100)],
        "doc_id string, v int")
    path = str(tmp_path / "t")
    write_encoded(df, path, n_buckets=1, run_id="r", cluster_by=["v"],
                  chunk_max_rows=20)
    out = read_encoded(spark, path, range_filter=("v", 0, 1))
    assert out.count() == 20


def test_multi_range_filter_conjunction(spark, grid):
    """range_filter accepts a LIST of triples — the natural read for a
    Z-ordered table: conjunction over both clustered dimensions, in
    the grouped AND the direct reader."""
    from tokcodec.io_tables import read_encoded_direct

    want = {(r.x, r.y) for r in read_encoded(spark, grid).collect()
            if 8 <= r.x <= 23 and 32 <= r.y <= 47}
    for reader in (read_encoded, read_encoded_direct):
        got = reader(spark, grid,
                     range_filter=[("x", 8, 23), ("y", 32, 47)])
        assert {(r.x, r.y) for r in got.collect()} == want, reader.__name__
    assert len(want) == 16 * 16
