"""Wall-clock time travel (``as_of_ts``), Iceberg's timestamp-based
snapshot read: the bound resolves to the greatest epoch fully
committed at or before it, then delegates to the epoch path (snapshot
schema and all). Lineage commit timestamps have second resolution, so
the fixture sleeps across a second boundary between epochs."""

import time

import pytest

from tokcodec.io_tables import (
    read_encoded,
    read_encoded_direct,
    resolve_as_of_ts,
    write_encoded,
)


@pytest.fixture(scope="module")
def two_epochs(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ttts") / "tbl")
    df0 = spark.createDataFrame(
        [("a", 1), ("b", 2)], "doc_id string, v int"
    )
    write_encoded(df0, path, n_buckets=1, run_id="e0", epoch=0)
    t_between = time.time() + 0.6
    time.sleep(1.4)
    df1 = spark.createDataFrame([("c", 3)], "doc_id string, v int")
    write_encoded(df1, path, n_buckets=1, run_id="e1", epoch=1,
                  resume=True)
    return path, t_between


def test_ts_resolves_between_epochs(spark, two_epochs):
    path, t_between = two_epochs
    assert resolve_as_of_ts(spark, path, t_between) == 0
    snap = read_encoded(spark, path, as_of_ts=t_between)
    assert sorted(r.doc_id for r in snap.collect()) == ["a", "b"]
    d = read_encoded_direct(spark, path, as_of_ts=t_between)
    assert sorted(r.doc_id for r in d.collect()) == ["a", "b"]


def test_ts_now_sees_everything(spark, two_epochs):
    path, _ = two_epochs
    snap = read_encoded(spark, path, as_of_ts=time.time() + 5)
    assert sorted(r.doc_id for r in snap.collect()) == ["a", "b", "c"]


def test_ts_iso_string_accepted(spark, two_epochs):
    path, _ = two_epochs
    # far future ISO bound (naive => UTC) sees the full table
    snap = read_encoded(spark, path, as_of_ts="2100-01-01 00:00:00")
    assert snap.count() == 3


def test_ts_before_first_commit_raises(spark, two_epochs):
    path, _ = two_epochs
    with pytest.raises(ValueError, match="no committed epoch"):
        read_encoded(spark, path, as_of_ts=1.0)


def test_both_params_rejected(spark, two_epochs):
    path, t_between = two_epochs
    with pytest.raises(ValueError, match="only one of"):
        read_encoded(spark, path, as_of_epoch=0, as_of_ts=t_between)
