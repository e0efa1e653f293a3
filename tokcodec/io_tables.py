"""Encoded-table storage layer (≙ reference S1/S2 sinks/sources).

Layout (Iceberg-like directory table — Iceberg jars are not in this
sandbox, so the same commit protocol is implemented on plain parquet
directories; swap ``.write.parquet`` for ``.writeTo(iceberg_table)``
on a real cluster):

    <path>/blocks/    parquet, compression=none (payloads carry their
                      own compression — measuring ours, not snappy's)
    <path>/lineage/   parquet commit records, append-only
    <path>/_manifest.json   schema + bucket count (schema-on-read,
                      ≙ reference footer schema)
"""

from __future__ import annotations

import json
import os

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from tokcodec.decode import decode_blocks
from tokcodec.encode import BUCKET_COL, with_bucket
from tokcodec.lineage import committed, lineage_from_blocks
from tokcodec.schema import BLOCK_DDL, LINEAGE_DDL, manifest_schema, schema_manifest


def _paths(path: str) -> tuple[str, str, str]:
    return os.path.join(path, "blocks"), os.path.join(path, "lineage"), os.path.join(
        path, "_manifest.json"
    )


def _hadoop_fs(spark: SparkSession, path: str):
    """(fs, jvm_path) via Hadoop's FileSystem API, or (None, None) when
    the JVM gateway isn't reachable (the only case where the local-FS
    fallback is legitimate — a REAL write/read failure on HDFS/S3 must
    propagate, not silently land on the driver's local disk)."""
    try:
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path)
        return p.getFileSystem(conf), p
    except Exception:
        return None, None


def _write_text(spark: SparkSession, path: str, content: str) -> None:
    """Write the manifest through Hadoop's FileSystem API so the table
    layout works on HDFS/S3 paths, not just the local FS (plain open()
    was a real-cluster gap flagged in round 1)."""
    fs, p = _hadoop_fs(spark, path)
    if fs is None:
        with open(path, "w") as f:  # no JVM gateway: local-FS fallback
            f.write(content)
        return
    out = fs.create(p, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def _read_text(spark: SparkSession, path: str) -> str:
    fs, p = _hadoop_fs(spark, path)
    if fs is None:
        with open(path) as f:
            return f.read()
    if not fs.exists(p):
        raise FileNotFoundError(path)
    stream = fs.open(p)
    try:
        jvm = spark.sparkContext._jvm
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def write_encoded(
    df: DataFrame,
    path: str,
    n_buckets: int,
    run_id: str | None = None,
    resume: bool = False,
    fail_after_buckets: int | None = None,
    epoch: int = 0,
    cluster_by: str | None = None,
    chunk_max_rows: int | None = None,
    chunk_max_values: int | None = None,
    uuid_columns: list[str] | None = None,
    bloom_columns: list[str] | None = None,
    enum_columns: dict[str, list[str]] | None = None,
) -> dict:
    """Encode ``df`` into ``path``. With ``resume=True``, buckets whose
    lineage commit already exists are skipped (anti-join against the
    checkpoint). ``fail_after_buckets`` encodes only the first k pending
    buckets — the fault-injection hook for resumability tests.

    ``uuid_columns``: string columns holding canonical UUIDs are stored
    as 16-byte binary (the reference's FIXED_LEN_BYTE_ARRAY(16) UUID
    logical type, UuidWrite.java:25-32 / LogicalTypeConverters.java:
    140-151 — 2.25x smaller than the 36-char text before compression)
    and converted back to canonical lowercase strings on read."""
    spark = df.sparkSession
    blocks_p, lineage_p, manifest_p = _paths(path)
    run_id = run_id or uuid.uuid4().hex[:12]
    for c in uuid_columns or []:
        # JVM-side: strip dashes, hex-decode to 16 bytes. A value that
        # is not a canonical UUID fails the write loudly — unhex would
        # otherwise return null and silently corrupt the column.
        cleaned = F.translate(F.col(c), "-", "")
        ub = F.unhex(cleaned)
        ok = F.col(c).isNull() | ((F.length(cleaned) == 32) & ub.isNotNull())
        df = df.withColumn(
            c,
            F.when(ok, ub).otherwise(F.raise_error(F.concat(
                F.lit(f"column {c!r}: not a canonical UUID: "), F.col(c)
            ))),
        )

    b = with_bucket(df, n_buckets)
    done: list[int] = []
    if resume and os.path.exists(lineage_p):
        lin = spark.read.schema(LINEAGE_DDL).parquet(lineage_p)
        done = [r.bucket for r in
                committed(lin, epoch=epoch).select("bucket").collect()]
        if done:
            b = b.filter(~F.col(BUCKET_COL).isin(done))
    pending = None
    if fail_after_buckets is not None:
        pending = sorted(
            r[BUCKET_COL]
            for r in b.select(BUCKET_COL).distinct().collect()
        )[:fail_after_buckets]
        b = b.filter(F.col(BUCKET_COL).isin(pending))

    from tokcodec.encode import encode_bucketed

    from tokcodec.encode import CHUNK_MAX_ROWS, CHUNK_MAX_VALUES

    blocks = encode_bucketed(
        b, df.schema, n_buckets, run_id, cluster_by=cluster_by,
        chunk_max_rows=chunk_max_rows or CHUNK_MAX_ROWS,
        chunk_max_values=chunk_max_values or CHUNK_MAX_VALUES,
        bloom_columns=tuple(bloom_columns or ()),
        enum_columns=enum_columns,
    )
    (
        blocks.write.mode("append")
        # one directory per column: projection on read = partition
        # pruning; unrequested columns' payload files are never opened
        # (reference P3's "only pages of requested columns are read")
        .partitionBy("column")
        .option("compression", "none")
        .parquet(blocks_p)
    )
    # commit point: lineage written only after blocks are durable
    # (explicit schema: an empty run writes no data files to infer from).
    # Read back ONLY the metrics partition (blocks are partitioned by
    # column -> directory pruning): the commit touches a handful of tiny
    # rows per bucket, never the payload files of this or earlier runs.
    from tokcodec.encode import METRICS_COLUMN

    new_metrics = (
        spark.read.schema(BLOCK_DDL).parquet(blocks_p)
        .filter((F.col("column") == METRICS_COLUMN)
                & (F.col("run_id") == run_id))
    )
    lineage_from_blocks(new_metrics, epoch=epoch).write.mode("append").parquet(lineage_p)
    _write_text(spark, manifest_p,
                schema_manifest(df.schema, n_buckets, run_id,
                                uuid_columns=uuid_columns,
                                enum_columns=enum_columns))

    lin = spark.read.schema(LINEAGE_DDL).parquet(lineage_p)
    agg = (
        committed(lin)
        .agg(
            F.count("*").alias("buckets"),
            F.sum("n_rows").alias("rows"),
            F.sum("orig_bytes").alias("orig_bytes"),
            F.sum("enc_bytes").alias("enc_bytes"),
        )
        .collect()[0]
    )
    return {
        "run_id": run_id,
        "buckets": agg.buckets or 0,
        "rows": agg.rows or 0,
        "orig_bytes": agg.orig_bytes,
        "enc_bytes": agg.enc_bytes,
        "skipped_buckets": len(done),
        "ratio": (agg.enc_bytes / agg.orig_bytes) if agg.orig_bytes else None,
    }


def suggest_buckets(total_bytes: int,
                    target_bucket_bytes: int = 256 << 20) -> int:
    """Bucket count so one bucket ~ target size (default 256MB): at
    100TB input -> ~400k buckets; executors stay memory-safe and the
    ~ms-level per-task runner overhead stays negligible."""
    return max(1, int(total_bytes / target_bucket_bytes))


def _expand_uuid_cols(out: DataFrame, uuid_cols) -> DataFrame:
    for c in uuid_cols:
        if c not in out.columns:
            continue
        h = F.lower(F.hex(F.col(c)))
        # F.concat propagates nulls (concat_ws would turn a null
        # uuid into "----")
        out = out.withColumn(
            c,
            F.concat(
                F.substring(h, 1, 8), F.lit("-"),
                F.substring(h, 9, 4), F.lit("-"),
                F.substring(h, 13, 4), F.lit("-"),
                F.substring(h, 17, 4), F.lit("-"),
                F.substring(h, 21, 12),
            ),
        )
    return out


def _bloom_prune(blocks: DataFrame, col: str, value) -> DataFrame:
    """Keep only (run_id, bucket, chunk)s whose bloom might contain
    ``value``; chunks of ``col`` without a bloom block always survive
    (mixed old/new runs stay correct). The membership test runs
    executor-side, vectorized over chunk blooms — nothing is collected."""
    import pyarrow as pa

    from tokcodec.bloom import bloom_params, bloom_test_arrow

    vb = value.encode("utf-8") if isinstance(value, str) else bytes(value)
    g1, g2 = bloom_params(vb)
    keys = ["run_id", "bucket", "chunk"]

    def test(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            hit = bloom_test_arrow(tbl.column("payload"), g1, g2)
            yield pa.RecordBatch.from_arrays(
                [tbl.column(k).combine_chunks() for k in keys]
                + [pa.array(hit)],
                names=keys + ["hit"],
            )

    blooms = blocks.filter(
        (F.col("column") == col) & (F.col("component") == "bloom")
    ).select(*keys, "payload")
    hits = blooms.mapInArrow(
        test, "run_id string, bucket int, chunk int, hit boolean"
    )
    vals = blocks.filter(
        (F.col("column") == col) & (F.col("component") == "values")
    ).select(*keys).distinct()
    surv = (
        vals.join(hits, keys, "left")
        .filter(F.col("hit").isNull() | F.col("hit"))
        .select(*keys)
    )
    return blocks.join(F.broadcast(surv), keys, "left_semi")


def read_encoded(
    spark: SparkSession, path: str, columns: list[str] | None = None,
    range_filter: tuple[str, int, int] | None = None,
    in_filter: tuple[str, list[int]] | None = None,
    eq_filter: tuple[str, str | bytes] | None = None,
    verify_checksums: bool = False,
) -> DataFrame:
    """Decode an encoded table; ``columns`` is projection pushdown —
    only those columns' blocks are scanned and decoded (reference P3).

    ``range_filter=(int_column, lo, hi)`` enables zone-map chunk
    skipping (the encoded-block analogue of parquet row-group pruning):
    whole (bucket, chunk)s whose stored [lo, hi] range misses the
    predicate are never decoded; an exact residual filter is applied
    to the survivors. Filter semantics: lo <= col <= hi.

    ``in_filter=(int_column, values)`` is the set-membership variant:
    chunks whose [lo, hi] zone contains none of the values are skipped
    (the IVF ANN probe path — encode with ``cluster_by='cell'`` so
    chunk zones are tight).

    ``eq_filter=(str_column, value)`` prunes via per-chunk bloom
    filters (write with ``bloom_columns=[str_column]``): chunks whose
    bloom definitively excludes the value are skipped; chunks with no
    bloom block always survive (no false negatives)."""
    blocks_p, lineage_p, manifest_p = _paths(path)
    manifest = json.loads(_read_text(spark, manifest_p))
    schema = manifest_schema(manifest)
    blocks = spark.read.schema(BLOCK_DDL).parquet(blocks_p)
    lin = committed(spark.read.schema(LINEAGE_DDL).parquet(lineage_p)) \
        .select("bucket", "run_id")
    # small table: one row per bucket — broadcast the semi join
    blocks = blocks.join(F.broadcast(lin), ["bucket", "run_id"], "left_semi")

    def _expand_uuids(out: DataFrame) -> DataFrame:
        return _expand_uuid_cols(out, manifest.get("uuid_columns", []))

    if sum(x is not None for x in (range_filter, in_filter, eq_filter)) > 1:
        raise ValueError("range_filter, in_filter and eq_filter are "
                         "mutually exclusive")
    if range_filter is None and in_filter is None and eq_filter is None:
        return _expand_uuids(decode_blocks(blocks, schema, columns,
                                           verify_checksums=verify_checksums))
    if eq_filter is not None:
        col, value = eq_filter
        if col in manifest.get("uuid_columns", []) and isinstance(value, str):
            # the column is stored as 16-byte binary: probe the bloom
            # and compare with the stored representation (the decoded
            # frame is uuid-expanded only afterwards)
            value = bytes.fromhex(value.replace("-", ""))
        pruned = _bloom_prune(blocks, col, value)
        out = decode_blocks(pruned, schema, columns,
                            verify_checksums=verify_checksums)
        return _expand_uuids(out.filter(F.col(col) == value))
    # zone filters only make sense on integer columns (those are the
    # ones whose values blocks carry [lo, hi]); anything else would
    # silently prune every chunk
    zone_col = (in_filter or range_filter)[0]
    fld = next((f.dataType for f in schema.fields if f.name == zone_col),
               None)
    if not isinstance(fld, (T.ByteType, T.ShortType, T.IntegerType,
                            T.LongType)):
        raise ValueError(
            f"range_filter/in_filter require an integer column with zone "
            f"maps; {zone_col!r} is {fld}"
        )
    zlo = F.get_json_object("meta", "$.lo").cast("long")
    zhi = F.get_json_object("meta", "$.hi").cast("long")
    if range_filter is not None:
        col, lo, hi = range_filter
        zpred = (zhi >= int(lo)) & (zlo <= int(hi))
        residual = (F.col(col) >= int(lo)) & (F.col(col) <= int(hi))
    else:
        col, values = in_filter
        values = [int(v) for v in values]
        zpred = F.lit(False)
        for v in values:
            zpred = zpred | ((zlo <= v) & (zhi >= v))
        residual = F.col(col).isin(values)
    # zone-map pass: chunks whose stats overlap the predicate — or
    # carry no stats (never a false negative). The zone map lives in
    # the stats column's block meta; all components of a surviving
    # (run_id, bucket, chunk) are kept so row alignment holds (keyed
    # by run_id too: multi-epoch appends reuse chunk numbers).
    zones = blocks.filter(
        (F.col("column") == col) & (F.col("component") == "values")
        & (zpred | zlo.isNull() | zhi.isNull())
    ).select("run_id", "bucket", "chunk").distinct()
    pruned = blocks.join(F.broadcast(zones), ["run_id", "bucket", "chunk"],
                         "left_semi")
    out = decode_blocks(pruned, schema, columns,
                        verify_checksums=verify_checksums)
    return _expand_uuids(out.filter(residual))


def read_encoded_direct(
    spark: SparkSession, path: str, columns: list[str] | None = None,
    verify_checksums: bool = False,
) -> DataFrame:
    """Shuffle-free decode: one task per committed bucket opens that
    bucket's block files directly with pyarrow dataset (hive partition
    pruning keeps unrequested columns' directories unread; row-group
    statistics on the `bucket` column skip other buckets' files — each
    written file holds exactly one (bucket, column)).

    `read_encoded` colocates a bucket's components with
    groupBy(bucket), which shuffles every payload byte once; this path
    moves no block data at all — only the decoded output. It wins when
    the shuffle is the bottleneck (network-bound clusters) and files
    are bucket-grained, which they are at production bucket sizes
    (one encode task per bucket). At sandbox scale AQE coalesces many
    tiny buckets into shared files/row groups, so the per-bucket reads
    re-decompress shared row groups and the grouped path measures
    faster locally (29.6 vs 5.5 M tok/s on the 38M-token table) —
    pick per deployment. At full scale, feed the bucket->files map
    from table metadata (Iceberg manifests) instead of the driver-side
    footer walk used here."""
    from tokcodec.decode import make_decode_fn

    blocks_p, lineage_p, manifest_p = _paths(path)
    manifest = json.loads(_read_text(spark, manifest_p))
    schema = manifest_schema(manifest)
    if columns is not None:
        by_name = {f.name: f for f in schema.fields}
        missing = set(columns) - set(by_name)
        if missing:
            raise ValueError(f"columns not in encoded table: {sorted(missing)}")
        schema = T.StructType([by_name[c] for c in columns])
    wanted = [f.name for f in schema.fields]
    lin = committed(spark.read.schema(LINEAGE_DDL).parquet(lineage_p)) \
        .select("bucket", "run_id")
    accepted: dict[int, list[str]] = {}
    for r in lin.collect():  # one row per (bucket, epoch) — tiny
        accepted.setdefault(int(r.bucket), []).append(r.run_id)
    inner = make_decode_fn(schema, verify_checksums=verify_checksums)
    acc_b = spark.sparkContext.broadcast(accepted)

    # one driver-side metadata pass maps bucket -> block files via the
    # bucket row-group statistics (a coalesced write task can put
    # SEVERAL buckets in one file, so each row group contributes its
    # [min, max] bucket range). At full scale this map comes from the
    # table metadata (Iceberg manifests) instead of a directory walk.
    import pyarrow.dataset as pads

    dset = pads.dataset(blocks_p, format="parquet", partitioning="hive")
    bucket_files: dict[int, list[tuple[str, str]]] = {}
    for frag in dset.get_fragments():
        colname = frag.path.split("column=")[-1].split("/")[0]
        if colname not in wanted:
            continue
        bs: set[int] = set()
        have_stats = True
        for rg in frag.row_groups:
            st = rg.statistics or {}
            bstat = st.get("bucket")
            if bstat is None:
                have_stats = False
                break
            bs.update(range(int(bstat["min"]), int(bstat["max"]) + 1))
        if not have_stats:
            # no bucket statistics: the file may hold ANY bucket —
            # read-and-filter everywhere rather than silently drop rows
            bs = set(accepted)
        for b in bs:
            bucket_files.setdefault(b, []).append((frag.path, colname))
    files_b = spark.sparkContext.broadcast(bucket_files)

    def fn(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq

        for batch in batches:
            for bucket in batch.column("bucket").to_pylist():
                runs = acc_b.value.get(bucket)
                flist = files_b.value.get(bucket, [])
                if not runs or not flist:
                    continue
                parts = []
                for fp, colname in flist:  # bounded: files per bucket
                    # filters prune row groups of multi-bucket files
                    t = pq.read_table(fp, filters=[
                        ("bucket", "=", bucket),
                        ("run_id", "in", sorted(set(runs))),
                    ])
                    if t.num_rows:
                        parts.append(t.append_column(
                            "column", pa.array([colname] * t.num_rows)
                        ))
                if not parts:
                    continue
                out = inner((bucket,), pa.concat_tables(parts))
                yield from out.to_batches()

    buckets_df = spark.createDataFrame(
        [(b,) for b in sorted(accepted)], "bucket int"
    )
    n_tasks = max(1, min(len(accepted) or 1,
                         spark.sparkContext.defaultParallelism * 2))
    out = buckets_df.repartition(n_tasks, F.col("bucket")).mapInArrow(
        fn, schema=schema
    )
    return _expand_uuid_cols(out, manifest.get("uuid_columns", []))


def read_encoded_as(
    spark: SparkSession, path: str, read_schema,
    aliases: dict[str, str] | None = None,
    fail_on_missing_column: bool = True,
    fail_on_narrowing: bool = False,
) -> DataFrame:
    """Schema-on-read decode with the reference's name-mapping and
    mismatch policy (reference P4/P5; see decode.decode_blocks_as)."""
    from tokcodec.decode import decode_blocks_as

    blocks_p, lineage_p, manifest_p = _paths(path)
    manifest = json.loads(_read_text(spark, manifest_p))
    file_schema = manifest_schema(manifest)
    blocks = spark.read.schema(BLOCK_DDL).parquet(blocks_p)
    lin = committed(spark.read.schema(LINEAGE_DDL).parquet(lineage_p)) \
        .select("bucket", "run_id")
    blocks = blocks.join(F.broadcast(lin), ["bucket", "run_id"], "left_semi")
    return decode_blocks_as(
        blocks, file_schema, read_schema, aliases=aliases,
        fail_on_missing_column=fail_on_missing_column,
        fail_on_narrowing=fail_on_narrowing,
    )


def encoded_size_bytes(path: str) -> int:
    blocks_p, _, _ = _paths(path)
    total = 0
    for root, _dirs, files in os.walk(blocks_p):
        for fn in files:
            if not fn.startswith("_") and not fn.startswith("."):
                total += os.path.getsize(os.path.join(root, fn))
    return total


def parquet_size_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if not fn.startswith("_") and not fn.startswith("."):
                total += os.path.getsize(os.path.join(root, fn))
    return total
