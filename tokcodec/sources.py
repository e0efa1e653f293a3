"""Ingest sources (reference S1-S3).

- ``ingest_jdbc``: any JDBC query -> DataFrame -> encoded table; the
  type mapping the reference hand-rolls (DynamicJdbcExporter.java:
  442-501 SQL-type mapper, 220-356 value coercion) is built into
  Spark's JDBC dialects, so this is a thin, partitionable wrapper.
- ``stream_encode``: Structured Streaming ingest — every micro-batch
  runs the resumable encode (foreachBatch), so a crashed stream resumes
  from the lineage checkpoint exactly like a batch re-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tokcodec.io_tables import write_encoded


def jdbc_driver_available(spark: SparkSession, driver_class: str) -> bool:
    """True iff ``driver_class`` is loadable in the Spark JVM. The
    reference ships 90 JUnit tests across 5 databases
    (DynamicJdbcExporterDuckDBTest.java:48-279); here the end-to-end
    path is tested against the embedded Derby database that ships in
    Spark's jar dir (tests/test_jdbc_derby.py + the driver-oracled
    ``jdbc_ingest_roundtrip`` query). For other databases, call this
    first on a real cluster to fail fast with a clear message instead
    of a deep py4j stack."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(driver_class)
        return True
    except Exception:
        return False


def ingest_jdbc(
    spark: SparkSession,
    url: str,
    query: str,
    properties: dict | None = None,
    fetchsize: int = 1000,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound=None,
    upper_bound=None,
) -> DataFrame:
    """JDBC query -> DataFrame (reference S3 DynamicJdbcExporter:
    schema from ResultSetMetaData == Spark's JDBC schema inference;
    batch size 1000 == fetchsize; optional range partitioning for
    parallel extraction, which the reference lacks).

    Tested end-to-end against embedded Derby (the one JDBC driver on
    this sandbox's Spark classpath — tests/test_jdbc_derby.py); type
    mapping and value coercion delegate to Spark's built-in JDBC
    dialects (S4/S5)."""
    if properties and "driver" in (properties or {}):
        if not jdbc_driver_available(spark, properties["driver"]):
            raise RuntimeError(
                f"JDBC driver {properties['driver']!r} not on the Spark "
                "classpath — add the jar via spark.jars"
            )
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("fetchsize", str(fetchsize))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        # Spark rejects `query` + partitionColumn; the partitioned
        # path requires `dbtable` — wrap arbitrary queries as a
        # derived table (works on Derby/Postgres/MySQL dialects)
        reader = (
            reader.option("dbtable", f"({query}) ingest_q")
            .option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions or 8))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    else:
        reader = reader.option("query", query)
    return reader.load()


def stream_encode(
    stream_df: DataFrame,
    path: str,
    n_buckets: int,
    checkpoint_dir: str,
    trigger_once: bool = False,
    **write_kwargs,
):
    """Structured-Streaming sink: each micro-batch is encoded with the
    resumable batch writer; bucket-level lineage makes redelivered
    batches idempotent for already-committed buckets.

    ``write_kwargs`` forward to write_encoded per batch (bloom/enum/
    uuid columns, codec_override, encryption_key, ...).

    Returns the StreamingQuery (caller awaits/stops it)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        import uuid

        # run_id is attempt-unique (a redelivered batch must not append
        # blocks under an already-committed run_id); epoch = batch_id
        # makes redelivery idempotent per (bucket, epoch)
        write_encoded(
            batch_df, path, n_buckets=n_buckets,
            run_id=f"stream-{batch_id}-{uuid.uuid4().hex[:8]}",
            resume=True, epoch=batch_id, **write_kwargs,
        )

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
