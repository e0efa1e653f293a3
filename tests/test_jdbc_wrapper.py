"""JDBC wrapper: no driver jar exists in this sandbox (the reference
tests against 5 real databases), so the end-to-end path is untestable
here — these tests pin the detection/fail-fast behavior instead."""

import pytest

from tokcodec.sources import ingest_jdbc, jdbc_driver_available


def test_driver_detection(spark):
    assert not jdbc_driver_available(spark, "org.nosuch.Driver")
    # a class that definitely exists in the Spark JVM
    assert jdbc_driver_available(spark, "java.lang.String")


def test_ingest_fails_fast_without_driver(spark):
    with pytest.raises(RuntimeError, match="not on the Spark classpath"):
        ingest_jdbc(
            spark, "jdbc:postgresql://nowhere/db", "SELECT 1",
            properties={"driver": "org.postgresql.Driver"},
        )
