"""SparkSession factory with the engine's recommended configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def warm_python_workers(spark: SparkSession, waves: int = 2) -> None:
    """Force-spawn the full Python worker pool (one-time fork + heavy
    imports per worker — amortized to zero on a long-lived cluster).

    Uses mapInArrow over an explicitly partitioned range: no shuffle,
    so AQE cannot coalesce it below one task per core (a tiny grouped
    warmup job would be coalesced to ~1 task and warm ~1 worker).
    """
    import pyarrow as pa

    cpus = spark.sparkContext.defaultParallelism

    def _warm(it):
        # the imports every encode/decode task needs
        import numpy  # noqa: F401

        from tokcodec import blocks, decode, encode  # noqa: F401

        for batch in it:
            yield batch

    for _ in range(waves):
        spark.range(0, cpus * 2, 1, cpus * 2).mapInArrow(
            _warm, "id long"
        ).count()


def get_spark(
    master: str | None = None,
    app_name: str = "tokcodec",
    shuffle_partitions: int | None = None,
    driver_memory: str = "16g",
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 32)
    # shuffle/spill on RAM-backed storage when available (the sandbox
    # disk is slow shared virtio; a real cluster would use local NVMe)
    local_dir = "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else None
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # block files are self-contained per-column payloads, often
        # well under the 4 MB default openCost; at that default every
        # file becomes its own scan partition (maxSplitBytes collapses
        # to openCost when bytesPerCore is small), turning a 255-file
        # table into 200+ scheduler-bound tasks. 128 KB packs several
        # block files per task; irrelevant for large files.
        .config("spark.sql.files.openCostInBytes", str(128 << 10))
        # reads plan EXPLICIT file lists from the run manifests; above
        # this many paths Spark launches a distributed listing job
        # (one task per path) before every scan — pure fixed latency
        # for the file counts a run produces. Driver-side getFileStatus
        # is cheap up to a few thousand paths; beyond that (huge
        # many-run tables) the distributed listing earns its keep.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
                "2048")
        # unlock TIME-typed expressions (make_time/hour/...): the
        # engine stores TimeType columns on the int64 nanos lane and
        # Spark 4.1 gates the SQL surface behind this flag
        .config("spark.sql.timeType.enabled", "true")
        # let the tokcodec Python DataSource's opt-in pushdown reader
        # (option("pushdown", "true")) receive WHERE predicates for
        # zone/bloom chunk pruning (off by default in Spark 4.1)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    return builder.getOrCreate()
