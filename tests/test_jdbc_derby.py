"""Real JDBC end-to-end against the embedded Derby database that ships
in Spark's own jar directory (derby-10.16 — present for Hive metastore
support, usable as a genuine JDBC source).  This is the sandbox
analogue of the reference's 90 JUnit tests across 5 databases
(carpet-jdbc/.../DynamicJdbcExporterDuckDBTest.java:48-279): rows go
INTO a real database over JDBC, come back out through Spark's JDBC
source + dialect type mapping (reference S4/S5), and round-trip
through the engine's encode/decode bit-identically.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tokcodec import read_encoded, write_encoded
from tokcodec.sources import ingest_jdbc, jdbc_driver_available

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    if not jdbc_driver_available(spark, DRIVER):
        pytest.skip("embedded Derby driver not on the Spark classpath")
    db = os.path.join(str(tmp_path_factory.mktemp("derby")), "db")
    return f"jdbc:derby:{db};create=true"


def _write_table(df, url, table):
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )


def test_driver_present(spark):
    # the sandbox DOES carry one real JDBC driver: embedded Derby
    assert jdbc_driver_available(spark, DRIVER)


def test_jdbc_typed_roundtrip(spark, derby_url, tmp_path):
    """Mixed-type rows -> Derby -> ingest_jdbc -> encode -> decode.

    Exercises the reference's SQL-type mapper + value coercion
    (DynamicJdbcExporter.java:442-501, 220-356) via Spark's
    DerbyDialect, then the engine's int/string/double/decimal/date/
    timestamp/bool codecs on genuinely JDBC-sourced data."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = spark.sql(
        """
        SELECT CAST(id AS INT)                       AS id,
               CONCAT('name-', CAST(id AS STRING))   AS name,
               CAST(id AS DOUBLE) / 7.0              AS score,
               CAST(CAST(id AS DECIMAL(10,2)) * 1.25 AS DECIMAL(10,2))
                                                     AS price,
               DATE_ADD(DATE'2024-01-01', CAST(id AS INT)) AS d,
               TIMESTAMP'2024-06-01 12:00:00' + MAKE_INTERVAL(0,0,0,0,0,0,id)
                                                     AS ts,
               id % 2 = 0                            AS flag,
               CAST(id % 1000 AS SMALLINT)           AS small
        FROM RANGE(500)
        """
    )
    _write_table(src, derby_url, "typed")

    got = ingest_jdbc(
        spark, derby_url, "SELECT * FROM typed",
        properties={"driver": DRIVER},
    )
    # Derby/JDBC dialect widenings (reference S4's mapper makes the
    # same calls): SMALLINT comes back as INT on some dialects; compare
    # after casting both sides to the ingested schema
    enc = str(tmp_path / "enc")
    write_encoded(got, enc, n_buckets=4, run_id="jdbc")
    dec = read_encoded(spark, enc)

    src_cast = src.select([F.col(f.name).cast(dict(
        (g.name, g.dataType) for g in got.schema)[f.name]).alias(f.name)
        for f in src.schema])
    assert dec.schema == got.schema
    assert dec.exceptAll(src_cast).count() == 0
    assert src_cast.exceptAll(dec).count() == 0


def test_jdbc_partitioned_ingest(spark, derby_url, tmp_path):
    """Range-partitioned parallel extraction (the knob the reference's
    single-connection exporter lacks): 4 concurrent JDBC partitions
    must produce the same rows as one."""
    src = spark.range(1000).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    _write_table(src, derby_url, "parted")
    whole = ingest_jdbc(
        spark, derby_url, "SELECT * FROM parted",
        properties={"driver": DRIVER},
    )
    parted = ingest_jdbc(
        spark, derby_url, "SELECT * FROM parted",
        properties={"driver": DRIVER},
        partition_column="k", num_partitions=4,
        lower_bound=0, upper_bound=1000,
    )
    assert parted.rdd.getNumPartitions() == 4
    assert parted.exceptAll(whole).count() == 0
    assert whole.exceptAll(parted).count() == 0


def test_jdbc_nulls_and_empty(spark, derby_url, tmp_path):
    """NULLs in every column and an empty result set — the coercion
    edge cases the reference tests per-database."""
    src = spark.sql(
        """
        SELECT CAST(id AS INT) AS id,
               CASE WHEN id % 3 = 0 THEN NULL
                    ELSE CONCAT('s', CAST(id AS STRING)) END AS s,
               CASE WHEN id % 4 = 0 THEN NULL
                    ELSE CAST(id AS DOUBLE) END AS x
        FROM RANGE(60)
        """
    )
    _write_table(src, derby_url, "withnulls")
    got = ingest_jdbc(
        spark, derby_url, "SELECT * FROM withnulls",
        properties={"driver": DRIVER},
    )
    enc = str(tmp_path / "encnull")
    write_encoded(got, enc, n_buckets=2, run_id="jdbcn")
    dec = read_encoded(spark, enc)
    assert dec.filter(F.col("s").isNull()).count() == 20
    assert dec.filter(F.col("x").isNull()).count() == 15
    assert dec.exceptAll(got).count() == 0

    empty = ingest_jdbc(
        spark, derby_url, 'SELECT * FROM withnulls WHERE "id" < 0',
        properties={"driver": DRIVER},
    )
    assert empty.count() == 0
