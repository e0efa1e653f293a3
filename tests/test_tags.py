"""Snapshot tags (Iceberg tag refs): name an epoch, read it by name —
`as_of_tag` on both readers."""

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from tokcodec.io_tables import (
    read_encoded,
    read_encoded_direct,
    tag_encoded,
    tags_encoded,
    untag_encoded,
    write_encoded,
)

SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("n", T.IntegerType(), False),
])


def _mk(spark, lo, hi):
    return spark.createDataFrame(
        [Row(doc_id=f"d{i}", n=i) for i in range(lo, hi)], SCHEMA)


def test_tag_and_read_by_name(spark, tmp_path):
    path = str(tmp_path / "t")
    write_encoded(_mk(spark, 0, 10), path, n_buckets=2, run_id="e0",
                  epoch=0)
    info = tag_encoded(spark, path, "v1")  # defaults to latest epoch
    assert info == {"tag": "v1", "epoch": 0}
    write_encoded(_mk(spark, 10, 25), path, n_buckets=2, run_id="e1",
                  epoch=1)
    tag_encoded(spark, path, "v2")
    assert tags_encoded(spark, path) == {"v1": 0, "v2": 1}
    assert read_encoded(spark, path, as_of_tag="v1").count() == 10
    assert read_encoded(spark, path, as_of_tag="v2").count() == 25
    assert read_encoded_direct(spark, path, as_of_tag="v1").count() == 10
    untag_encoded(spark, path, "v1")
    with pytest.raises(ValueError, match="unknown tag"):
        read_encoded(spark, path, as_of_tag="v1")
    with pytest.raises(ValueError, match="only one of"):
        read_encoded(spark, path, as_of_tag="v2", as_of_epoch=0)


def test_tag_validation(spark, tmp_path):
    path = str(tmp_path / "t2")
    write_encoded(_mk(spark, 0, 4), path, n_buckets=1, run_id="e0")
    with pytest.raises(ValueError, match="tag"):
        tag_encoded(spark, path, "bad name")
    with pytest.raises(ValueError, match="unknown tag"):
        untag_encoded(spark, path, "nope")
