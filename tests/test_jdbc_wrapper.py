"""JDBC wrapper detection/fail-fast behavior for drivers that are NOT
on the classpath (the end-to-end path is covered against real embedded
Derby in test_jdbc_derby.py)."""

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
