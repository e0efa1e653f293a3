"""tokcodec as a Spark DATA SOURCE (Spark 4 Python DataSource API):

    from tokcodec.datasource import TokcodecDataSource
    spark.dataSource.register(TokcodecDataSource)

    spark.read.format("tokcodec").load("/data/enc")          # batch
    spark.readStream.format("tokcodec").load("/data/enc")    # CDC
    df.write.format("tokcodec").mode("append").save(...)     # append
    df.write.format("tokcodec").mode("overwrite").save(...)  # replace
    df.writeStream.format("tokcodec").start("/data/enc")     # sink
    (Python data sources take explicit append/overwrite modes only)

This is the reference's "reads like any table" promise
(CarpetReader / parquet's DataSource integration) delivered through
Spark's own source API instead of a bespoke reader call:

- batch reads plan one InputPartition per committed bucket and decode
  executor-side with pyarrow — the shuffle-free direct-reader shape;
- WHERE predicates arrive via pushFilters and drive zone-map/bloom
  CHUNK PRUNING before any payload is decoded; every filter is also
  returned to Spark unhandled, so Spark re-applies the exact
  predicate (pruning is best-effort, correctness is Spark's — chunks
  with no stats always survive, so no false negatives are possible);
- the STREAM reader turns the epoch lineage into a Structured
  Streaming source: each micro-batch covers the (start, end] epoch
  window (exactly ``read_encoded(since_epoch=...)``'s incremental
  semantics), so `readStream` tails a table that streaming ingest or
  upserts keep appending to;
- pending equality deletes are applied per task (each task loads the
  small removal-list parquet once; for a huge list prefer
  read_encoded's broadcast anti-join);
- planning is Spark-free (pyarrow fs + pandas over the tiny lineage
  table) because DataSource methods run without a SparkSession, and
  every partition is self-contained (bucket, files, prune specs,
  removal lists), so nothing depends on reader pickling order.

- the WRITE path reuses write_encoded's exact task body (encode ->
  block files -> O(run) metadata commit), so DataSource-written and
  write_encoded-written runs co-exist in one table; each input
  partition becomes one bucket (repartition upstream to shape bucket
  sizes / defuse skew), appends land at a fresh epoch, overwrite
  supersedes atomically (tombstones + commits in ONE lineage append),
  and the streaming sink commits each micro-batch as epoch=batchId —
  idempotent under batch replay via latest-run-wins.

Read options: ``path`` (or load(path)), ``encryption_key_hex``,
``as_of_epoch``, ``since_epoch`` (batch: epoch window; stream:
starting offset), ``pushdown``. Write options: ``bloom_columns`` /
``sketch_columns`` / ``cluster_by`` / ``encrypted_columns`` (comma
lists), ``chunk_max_rows`` / ``chunk_max_values``, ``codec_override``
(JSON), ``encryption_key_hex``, ``run_id``. uuid/enum column
conversion and schema evolution go through write_encoded."""

from __future__ import annotations

import json
import posixpath

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

from tokcodec.schema import LAYOUT_VERSION, manifest_schema


# ------------------------------------------------ Spark-free planning

def _fs(path: str):
    from tokcodec.io_tables import _task_fs

    return _task_fs(path)


def _read_json(path: str) -> dict:
    fs, root = _fs(path)
    with fs.open_input_stream(root) as f:
        return json.loads(f.read().decode("utf-8"))


def _lineage_pandas(path: str):
    import pyarrow.dataset as pads

    fs, root = _fs(posixpath.join(path, "lineage"))
    return pads.dataset(root, format="parquet",
                        filesystem=fs).to_table().to_pandas()


def _committed_local(lin, as_of_epoch=None, since_epoch=None):
    """pandas mirror of lineage.committed(): winner per (bucket,
    epoch) by (ts, status, run_id) desc, kept iff committed."""
    lin = lin[lin.status.isin(["committed", "tombstone"])]
    if as_of_epoch is not None:
        lin = lin[lin.epoch <= int(as_of_epoch)]
    if since_epoch is not None:
        lin = lin[lin.epoch > int(since_epoch)]
    win = (lin.sort_values(["ts", "status", "run_id"], ascending=False)
           .drop_duplicates(["bucket", "epoch"]))
    return win[win.status == "committed"]


def _deletes_local(path: str, lin, manifest: dict,
                   as_of_epoch=None) -> list[dict]:
    """pandas mirror of io_tables._active_deletes; uuid key columns
    get their keys pre-converted to the stored 16-byte form so the
    executor-side mask compares like with like."""
    from tokcodec.io_tables import DELETE_BUCKET

    d = lin[(lin.bucket == DELETE_BUCKET)
            & lin.status.isin(["delete", "tombstone"])]
    if as_of_epoch is not None:
        d = d[d.epoch <= int(as_of_epoch)]
    win = (d.sort_values(["ts", "status", "run_id"], ascending=False)
           .drop_duplicates(["epoch"]))
    out = []
    for _, r in win[win.status == "delete"].iterrows():
        meta = json.loads(r.codecs or "{}")
        out.append({"delete_id": r.run_id, "epoch": int(r.epoch),
                    "key_column": meta["key_column"],
                    "file": meta["file"],
                    "uuid": meta["key_column"]
                    in manifest.get("uuid_columns", [])})
    return sorted(out, key=lambda x: x["epoch"])


def _run_files_local(path: str, run_ids) -> list[dict]:
    files: list[dict] = []
    for rid in sorted(set(run_ids)):
        man = _read_json(posixpath.join(path, "_runs", f"{rid}.json"))
        for f in man["files"]:
            f = dict(f)
            f["run_id"] = rid
            files.append(f)
    return files


def _plan(path: str, as_of_epoch=None, since_epoch=None):
    """(manifest, accepted {bucket: [run_id]}, files, deletes)."""
    manifest = _read_json(posixpath.join(path, "_manifest.json"))
    if manifest.get("layout", 1) != LAYOUT_VERSION:
        raise ValueError(
            f"table at {path!r} has layout {manifest.get('layout', 1)}; "
            f"this build reads layout {LAYOUT_VERSION}")
    lin = _lineage_pandas(path)
    win = _committed_local(lin, as_of_epoch, since_epoch)
    accepted: dict[int, list[str]] = {}
    for _, r in win.iterrows():
        accepted.setdefault(int(r.bucket), []).append(r.run_id)
    files = _run_files_local(path, {r for rs in accepted.values()
                                    for r in rs})
    dels = _deletes_local(path, lin, manifest, as_of_epoch)
    return manifest, accepted, files, dels


class _BucketPartition(InputPartition):
    """Self-contained task spec: everything read() needs."""

    def __init__(self, bucket: int, runs: list[str],
                 files: list[tuple[str, str]], specs: list[dict],
                 dels: list[dict], fill: str | None):
        self.bucket = bucket
        self.runs = runs
        self.files = files  # [(relative path, column), ...]
        self.specs = specs
        self.dels = dels
        self.fill = fill


def _make_partitions(path, accepted, files, schema, specs, dels,
                     extra_fields):
    from tokcodec.encode import METRICS_COLUMN
    from tokcodec.io_tables import (
        _direct_file_rows,
        _evolution_fill_columns,
    )

    wanted = ({f.name for f in schema.fields}
              | {f.name for f in extra_fields})
    fill = METRICS_COLUMN if _evolution_fill_columns(files, wanted) \
        else None
    scan_cols = set(wanted) | ({fill} if fill else set())
    rows = _direct_file_rows(files, scan_cols, "")
    parts = []
    for bucket, runs in sorted(accepted.items()):
        # a file holds exactly one run: accept/reject per
        # (file, bucket) here, so read() never run-filters rows
        flist = [(fp, col) for lo, hi, fp, col, rid in rows
                 if lo <= bucket <= hi and rid in runs]
        if flist:
            parts.append(_BucketPartition(bucket, runs, flist, specs,
                                          dels, fill))
    return parts


def _extra_delete_fields(schema: T.StructType, manifest: dict,
                         dels: list[dict]) -> list[T.StructField]:
    """Delete key columns missing from the projected schema must be
    decoded anyway (and dropped after the mask)."""
    have = {f.name for f in schema.fields}
    full = {f.name: f for f in manifest_schema(manifest).fields}
    out = []
    for d in dels:
        kc = d["key_column"]
        if kc not in have and kc in full and full[kc].name not in {
                f.name for f in out}:
            out.append(full[kc])
    return out


def _decode_bucket(path: str, part: _BucketPartition,
                   schema: T.StructType,
                   extra_fields: list[T.StructField], key_hex):
    """Executor-side: open the bucket's block files, prune chunks,
    decode, apply removal lists — the direct reader's task body."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tokcodec.decode import make_decode_fn
    from tokcodec.io_tables import _prune_block_table

    key = bytes.fromhex(key_hex) if key_hex else None
    fs, blocks_root = _fs(posixpath.join(path, "blocks"))
    parts = []
    for rel, _col in part.files:
        # run acceptance was decided at planning (one run per file);
        # the bucket filter prunes row groups of multi-bucket files
        with fs.open_input_file(posixpath.join(blocks_root, rel)) as f:
            t = pq.read_table(f, filters=[
                ("bucket", "=", part.bucket),
            ])
        if t.num_rows:
            parts.append(t)
    if not parts:
        return
    tbl = pa.concat_tables(parts)
    if part.specs:
        tbl = _prune_block_table(tbl, part.specs, encryption_key=key)
        if tbl.num_rows == 0:
            return
    decode_schema = T.StructType(list(schema.fields)
                                 + list(extra_fields))
    inner = make_decode_fn(decode_schema, encryption_key=key,
                           fill_from=part.fill)
    out = inner((part.bucket,), tbl)
    if part.dels:
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        for d in part.dels:
            dfs, droot = _fs(posixpath.join(path, d["file"]))
            keys = pads.dataset(droot, format="parquet",
                                filesystem=dfs).to_table()
            kcol = keys.column(d["key_column"])
            if d["uuid"]:
                kcol = pa.array(
                    [bytes.fromhex(s.replace("-", ""))
                     for s in kcol.to_pylist()], pa.binary())
            mask = pc.invert(pc.is_in(out.column(d["key_column"]),
                                      value_set=kcol))
            out = out.filter(mask)
    if extra_fields:
        out = out.select([f.name for f in schema.fields])
    yield from out.to_batches()


def _filter_specs(schema: T.StructType, manifest: dict, filters):
    """Pushed Spark filters -> zone/bloom prune specs (the pruning
    subset; every filter is ALSO re-applied by Spark).

    One-sided bounds on the SAME column are merged first, so a
    BETWEEN — which Catalyst hands over as two one-sided filters —
    prunes as ONE two-sided range. That merge is the only pruning
    possible on string/binary columns (truncated min/max bounds have
    no safe one-sided sentinel, so a lone `s > 'm'` stays unpruned
    and Spark applies it exactly), and on int/temporal lanes it
    halves the zone passes a BETWEEN would otherwise cost."""
    from tokcodec.io_tables import _normalize_filter

    lows: dict[str, list] = {}
    highs: dict[str, list] = {}
    rest = []
    for f in filters:
        one_sided = isinstance(
            f, (GreaterThan, GreaterThanOrEqual, LessThan,
                LessThanOrEqual))
        if one_sided and len(f.attribute) == 1 \
                and f.value is not None:
            side = lows if isinstance(
                f, (GreaterThan, GreaterThanOrEqual)) else highs
            side.setdefault(f.attribute[0], []).append(f.value)
        else:
            rest.append(f)

    specs = []

    def _push(kind, spec):
        try:
            nf = _normalize_filter(schema, manifest, kind, spec,
                                   make_residual=False)
        except (ValueError, TypeError, OverflowError):
            return  # unprunable shape — Spark still applies it
        specs.append({k: v for k, v in nf.items() if k != "residual"})

    for col in sorted(set(lows) | set(highs)):
        fld = next((x.dataType for x in schema.fields
                    if x.name == col), None)
        if fld is None:
            continue
        str_lane = isinstance(fld, (T.StringType, T.BinaryType))
        if str_lane and not (col in lows and col in highs):
            continue  # no safe one-sided string sentinel
        try:
            # strict vs non-strict collapses to the inclusive
            # superset — zone pruning only ever over-keeps, and the
            # exact predicate is Spark's either way
            lo = max(lows[col]) if col in lows else _lane_min(fld)
            hi = min(highs[col]) if col in highs else _lane_max(fld)
        except TypeError:
            continue  # incomparable mixed literals
        _push("range", (col, lo, hi))

    for f in rest:
        if len(getattr(f, "attribute", ())) != 1:
            continue
        col = f.attribute[0]
        fld = next((x.dataType for x in schema.fields
                    if x.name == col), None)
        if fld is None:
            continue
        if isinstance(f, EqualTo):
            if isinstance(fld, T.StringType) and isinstance(
                    f.value, str):
                _push("eq", (col, f.value))
            else:
                _push("range", (col, f.value, f.value))
        elif isinstance(f, In):
            vals = [v for v in f.value if v is not None]
            if not vals:
                continue
            if isinstance(fld, T.StringType) and all(
                    isinstance(v, str) for v in vals):
                _push("eq", (col, vals))  # bloom ANY-of probe
            else:
                _push("in", (col, vals))
    return specs


def _lane_max(fld):
    """Type-correct upper sentinel for one-sided pushdown bounds
    (a raw huge int would overflow the date/timestamp converters)."""
    import datetime as _dt

    if isinstance(fld, (T.FloatType, T.DoubleType)):
        return float("1e308")
    if isinstance(fld, T.DateType):
        return _dt.date.max
    if isinstance(fld, (T.TimestampType, T.TimestampNTZType)):
        return _dt.datetime(9999, 12, 31, 23, 59, 59)
    if isinstance(fld, T.TimeType):
        return _dt.time(23, 59, 59, 999999)
    return (1 << 62)


def _lane_min(fld):
    import datetime as _dt

    if isinstance(fld, (T.FloatType, T.DoubleType)):
        return float("-1e308")
    if isinstance(fld, T.DateType):
        return _dt.date.min
    if isinstance(fld, (T.TimestampType, T.TimestampNTZType)):
        return _dt.datetime(1, 1, 1)
    if isinstance(fld, T.TimeType):
        return _dt.time(0)
    return -(1 << 62)


class TokcodecBatchReader(DataSourceReader):
    def __init__(self, options: dict, schema: T.StructType):
        self.path = options.get("path") or options.get("paths")
        if not self.path:
            raise ValueError("tokcodec source needs a path: "
                             ".load('/table/path')")
        self.key_hex = options.get("encryption_key_hex")
        aoe = options.get("as_of_epoch")
        soe = options.get("since_epoch")
        self.manifest, self.accepted, self.files, self.dels = _plan(
            self.path,
            as_of_epoch=int(aoe) if aoe is not None else None,
            since_epoch=int(soe) if soe is not None else None)
        self.schema = schema
        self.extra = _extra_delete_fields(schema, self.manifest,
                                          self.dels)
        self.specs: list[dict] = []

    def partitions(self):
        return _make_partitions(self.path, self.accepted, self.files,
                                self.schema, self.specs, self.dels,
                                self.extra)

    def read(self, partition: _BucketPartition):
        yield from _decode_bucket(self.path, partition, self.schema,
                                  self.extra, self.key_hex)


class TokcodecPushdownBatchReader(TokcodecBatchReader):
    """Batch reader + WHERE-predicate chunk pruning. Spark refuses a
    reader that merely DEFINES pushFilters unless
    ``spark.sql.python.filterPushdown.enabled=true`` (off by default
    in Spark 4.1), so pruning is opt-in via
    ``.option("pushdown", "true")`` — tokcodec.session.get_spark
    enables the conf."""

    def pushFilters(self, filters):
        full = manifest_schema(self.manifest)
        self.specs = _filter_specs(full, self.manifest, filters)
        # hand every filter back: pruning is ours, exactness is Spark's
        return filters


class TokcodecStreamReader(DataSourceStreamReader):
    """Epoch-tailing CDC source: offset = {"epoch": N}; each
    micro-batch decodes the runs committed in (start, end]."""

    def __init__(self, options: dict, schema: T.StructType):
        self.path = options.get("path") or options.get("paths")
        if not self.path:
            raise ValueError("tokcodec source needs a path")
        self.key_hex = options.get("encryption_key_hex")
        self.start_epoch = int(options.get("since_epoch", -1))
        self.schema = schema
        manifest = _read_json(posixpath.join(self.path,
                                             "_manifest.json"))
        self.manifest = manifest

    def initialOffset(self) -> dict:
        return {"epoch": self.start_epoch}

    def latestOffset(self) -> dict:
        lin = _lineage_pandas(self.path)
        win = _committed_local(lin)
        top = int(win.epoch.max()) if len(win) else self.start_epoch
        return {"epoch": max(top, self.start_epoch)}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["epoch"]), int(end["epoch"])
        if hi <= lo:
            return []
        _m, accepted, files, dels = _plan(self.path, as_of_epoch=hi,
                                          since_epoch=lo)
        extra = _extra_delete_fields(self.schema, self.manifest, dels)
        self._extra = extra
        return _make_partitions(self.path, accepted, files,
                                self.schema, [], dels, extra)

    def read(self, partition: _BucketPartition):
        # recompute the extra fields from the partition itself (the
        # executor copy of this reader may predate partitions())
        extra = _extra_delete_fields(self.schema, self.manifest,
                                     partition.dels)
        yield from _decode_bucket(self.path, partition, self.schema,
                                  extra, self.key_hex)

    def commit(self, end: dict) -> None:
        pass  # offsets are derived from the durable lineage


# --------------------------------------------------------- write path

def _write_json_fs(path: str, content: str) -> None:
    """Spark-free manifest write via pyarrow fs (temp + atomic move),
    so the writer's driver-side commit works on local/HDFS/S3 paths
    without a JVM gateway."""
    import uuid as _uuid

    fs, root = _fs(path)
    fs.create_dir(posixpath.dirname(root), recursive=True)
    tmp = posixpath.join(posixpath.dirname(root),
                         f".{_uuid.uuid4().hex}.tmp")
    with fs.open_output_stream(tmp) as out:
        out.write(content.encode("utf-8"))
    fs.move(tmp, root)


def _exists(path: str) -> bool:
    from pyarrow import fs as pafs

    fs, root = _fs(path)
    return fs.get_file_info(root).type != pafs.FileType.NotFound


def _csv_opt(options: dict, key: str) -> list[str]:
    v = options.get(key)
    return [s.strip() for s in str(v).split(",") if s.strip()] if v \
        else []


class _RunFilesMessage(WriterCommitMessage):
    """Per-task commit message: the file-manifest rows this task wrote
    (path, column, bucket_ranges, n_rows, bytes) — O(files), never
    payload bytes. ``run_id`` matters for the streaming sink, where
    every task mints its own (see TokcodecStreamWriter)."""

    def __init__(self, files: list[dict], run_id: str):
        self.files = files
        self.run_id = run_id


class _WriterCore:
    """Shared executor-side body of the batch and stream writers.

    Each input partition becomes ONE bucket (bucket id = Spark
    partition id): the engine's salted-hash bucketing is an upstream
    concern here — repartition the DataFrame before the write to
    shape bucket sizes / defuse skew (``tokcodec.encode.with_bucket``
    is the library's own recipe). Encode + block persistence reuse
    write_encoded's exact task body (make_encode_sorted_fn ->
    _make_block_writer), so the on-disk layout, lineage metrics,
    blooms/sketches/encryption and O(run) commit are identical to a
    write_encoded table — the two writers are interchangeable and
    their runs co-exist in one table."""

    def __init__(self, schema: T.StructType, path: str, run_id: str,
                 options: dict):
        from tokcodec.crypto import new_run_salt, validate_key
        from tokcodec.encode import (
            validate_annotations,
            validate_codec_override,
        )

        self.schema = schema
        self.path = path
        self.run_id = run_id
        self.cluster_by = _csv_opt(options, "cluster_by") or None
        self.chunk_max_rows = int(options["chunk_max_rows"]) \
            if options.get("chunk_max_rows") else None
        self.chunk_max_values = int(options["chunk_max_values"]) \
            if options.get("chunk_max_values") else None
        self.bloom_columns = tuple(_csv_opt(options, "bloom_columns"))
        self.sketch_columns = tuple(_csv_opt(options, "sketch_columns"))
        self.codec_override = json.loads(options["codec_override"]) \
            if options.get("codec_override") else None
        key_hex = options.get("encryption_key_hex")
        self.encryption_key = bytes.fromhex(key_hex) if key_hex \
            else None
        enc_cols = _csv_opt(options, "encrypted_columns")
        if self.encryption_key is not None:
            validate_key(self.encryption_key)
            if not enc_cols:
                enc_cols = [f.name for f in schema.fields]
        elif enc_cols:
            raise ValueError(
                "encrypted_columns requires encryption_key_hex")
        self.encrypted_columns = tuple(sorted(enc_cols))
        self.encryption_salt = new_run_salt() \
            if self.encryption_key is not None else None
        validate_annotations(schema, self.bloom_columns, None,
                             sketch_columns=self.sketch_columns)
        validate_codec_override(schema, self.codec_override)

    def _write_partition(self, iterator):
        """Arrow batches of one partition -> block files on disk ->
        file-manifest rows (the only bytes that travel to commit)."""
        import numpy as np
        import pyarrow as pa
        from pyspark import TaskContext

        from tokcodec.encode import (
            BUCKET_COL,
            CHUNK_MAX_ROWS,
            CHUNK_MAX_VALUES,
            make_encode_sorted_fn,
        )
        from tokcodec.io_tables import _make_block_writer

        tc = TaskContext.get()
        bucket = tc.partitionId() if tc else 0
        enc = make_encode_sorted_fn(
            self.schema, self.run_id, cluster_by=self.cluster_by,
            chunk_max_rows=self.chunk_max_rows or CHUNK_MAX_ROWS,
            chunk_max_values=self.chunk_max_values or CHUNK_MAX_VALUES,
            bloom_columns=self.bloom_columns,
            sketch_columns=self.sketch_columns,
            codec_override=self.codec_override,
            encrypted_columns=self.encrypted_columns,
            encryption_key=self.encryption_key,
            encryption_salt=self.encryption_salt,
        )
        writer = _make_block_writer(
            posixpath.join(self.path, "blocks"), self.run_id)

        def with_bucket(batches):
            for b in batches:
                yield b.append_column(
                    BUCKET_COL,
                    pa.array(np.full(b.num_rows, bucket,
                                     dtype=np.int32)))

        files: list[dict] = []
        for out in writer(enc(with_bucket(iterator))):
            files.extend(out.to_pylist())
        return _RunFilesMessage(files, self.run_id)

    def _write_run_manifest(self, run_id: str, files: list[dict],
                            epoch: int) -> None:
        """Durable file list for one run — must exist before the
        lineage append makes any of its rows visible."""
        from tokcodec.io_tables import _run_manifest_path

        rman = _run_manifest_path(self.path, run_id)
        if _exists(rman):
            raise ValueError(
                f"run_id {run_id!r} already has a manifest at "
                f"{self.path!r} — duplicate commit refused")
        _write_json_fs(rman, json.dumps(
            {"run_id": run_id, "epoch": int(epoch),
             "schema_json": json.dumps(self.schema.jsonValue()),
             "files": [{k: f[k] for k in ("path", "column",
                                          "bucket_ranges", "n_rows",
                                          "bytes")}
                       for f in _decoded_ranges(files)]},
            separators=(",", ":")))

    def _commit_files(self, files: list[dict], epoch: int,
                      tombstones=None, n_buckets_floor: int = 0,
                      manifest_extra: dict | None = None) -> None:
        """THE commit, Spark-free: ONE atomic lineage append (with any
        superseding tombstones in the same file — lineage rows carry
        their run_id from the metrics blocks, so files from several
        runs commit together) -> table manifest refresh."""
        from tokcodec.io_tables import (
            METRICS_COLUMN,
            _commit_lineage_local,
        )
        from tokcodec.schema import schema_manifest

        blocks_p = posixpath.join(self.path, "blocks")
        metric_paths = [posixpath.join(blocks_p, f["path"])
                        for f in files if f["column"] == METRICS_COLUMN]
        _commit_lineage_local(None, self.path, metric_paths, epoch,
                              tombstones=tombstones)
        n_buckets = max(
            [n_buckets_floor, 1] + [hi + 1 for f in files
                                    for _lo, hi in
                                    json.loads(f["bucket_ranges"])])
        extra = manifest_extra or {}
        _write_json_fs(
            posixpath.join(self.path, "_manifest.json"),
            schema_manifest(self.schema, n_buckets, self.run_id,
                            uuid_columns=extra.get("uuid_columns"),
                            enum_columns=extra.get("enum_columns"),
                            encrypted_columns=list(
                                self.encrypted_columns),
                            bloom_columns=list(self.bloom_columns),
                            sketch_columns=list(self.sketch_columns)))

    def _commit_run(self, messages, epoch: int,
                    tombstones=None, n_buckets_floor: int = 0,
                    manifest_extra: dict | None = None) -> None:
        """Batch commit: one run manifest, then the atomic lineage
        append + table manifest."""
        files = [f for m in messages if m is not None
                 for f in m.files]
        self._write_run_manifest(self.run_id, files, epoch)
        self._commit_files(files, epoch, tombstones=tombstones,
                           n_buckets_floor=n_buckets_floor,
                           manifest_extra=manifest_extra)

    def _abort_run(self, messages) -> None:
        fs, blocks_root = _fs(posixpath.join(self.path, "blocks"))
        for m in messages or ():
            for f in getattr(m, "files", None) or ():
                try:
                    fs.delete_file(
                        posixpath.join(blocks_root, f["path"]))
                except Exception:
                    pass  # best-effort: orphans are invisible anyway


def _decoded_ranges(files: list[dict]) -> list[dict]:
    """Run-manifest rows keep bucket_ranges as a JSON string on disk
    exactly like write_encoded's (the batched spark.read.json scan
    types them); parse here so both writers emit identical shapes."""
    out = []
    for f in files:
        g = dict(f)
        g["bucket_ranges"] = json.loads(f["bucket_ranges"]) \
            if isinstance(f["bucket_ranges"], str) else \
            f["bucket_ranges"]
        out.append(g)
    return out


def _plan_epoch_and_tombstones(path: str, run_id: str,
                               schema: T.StructType, overwrite: bool):
    """(epoch, tombstones, n_buckets_floor, manifest_extra) for a
    batch write. Appends land at max(existing epoch)+1 — true append
    semantics (a same-epoch run would WIN the per-(bucket, epoch)
    latest-run dedup and silently replace rows). Overwrite commits
    the new run plus tombstones for every prior (bucket, epoch) and
    active delete in ONE lineage append (compact_encoded's atomic
    supersede, Spark-free)."""
    from tokcodec.io_tables import DELETE_BUCKET

    if not _exists(posixpath.join(path, "_manifest.json")):
        return 0, [], 0, {}
    manifest = _read_json(posixpath.join(path, "_manifest.json"))
    if manifest.get("layout", 1) != LAYOUT_VERSION:
        raise ValueError(
            f"table at {path!r} has layout {manifest.get('layout', 1)}")
    if manifest.get("uuid_columns") or manifest.get("enum_columns"):
        raise ValueError(
            "the DataSource writer does not handle uuid/enum column "
            "conversion — append to this table with write_encoded")
    lin = _lineage_pandas(path)
    live = lin[lin.status.isin(["committed", "delete"])]
    top = int(live.epoch.max()) if len(live) else -1
    epoch = top + 1
    if not overwrite:
        if manifest["ddl"] != schema.simpleString():
            raise ValueError(
                "schema mismatch on append: table has "
                f"{manifest['ddl']!r}, got {schema.simpleString()!r} "
                "(schema evolution goes through write_encoded)")
        return epoch, [], int(manifest.get("n_buckets", 0)), {
            "uuid_columns": manifest.get("uuid_columns"),
            "enum_columns": manifest.get("enum_columns")}
    win = _committed_local(lin)
    tombs = [(run_id, int(r.bucket), int(r.epoch))
             for _, r in win.iterrows()]
    dels = _deletes_local(path, lin, manifest)
    tombs += [(run_id, DELETE_BUCKET, d["epoch"]) for d in dels]
    return epoch, tombs, 0, {}


class TokcodecBatchWriter(DataSourceArrowWriter):
    """``df.write.format("tokcodec").save(path)`` — modes: append
    (default; lands at a fresh epoch) and overwrite (atomic
    tombstones + commit). DataSourceArrowWriter: payload stays in
    Arrow end-to-end."""

    def __init__(self, options: dict, schema: T.StructType,
                 overwrite: bool):
        import uuid as _uuid

        path = options.get("path") or options.get("paths")
        if not path:
            raise ValueError("tokcodec sink needs a path: "
                             ".save('/table/path')")
        run_id = options.get("run_id") or _uuid.uuid4().hex[:12]
        self.core = _WriterCore(schema, path, run_id, options)
        (self.epoch, self.tombstones, self.n_buckets_floor,
         self.manifest_extra) = _plan_epoch_and_tombstones(
            path, run_id, schema, overwrite)
        if self.core.encryption_key is None and not overwrite:
            enc = [] if not _exists(
                posixpath.join(path, "_manifest.json")) else _read_json(
                posixpath.join(path, "_manifest.json")).get(
                "encrypted_columns", [])
            if enc:
                raise ValueError(
                    f"table at {path!r} has encrypted columns {enc} — "
                    "appending plaintext rows to them needs the key "
                    "(pass encryption_key_hex); overwrite replaces "
                    "the table and may change the encryption set")

    def write(self, iterator):
        return self.core._write_partition(iterator)

    def commit(self, messages):
        self.core._commit_run(messages, self.epoch,
                              tombstones=self.tombstones,
                              n_buckets_floor=self.n_buckets_floor,
                              manifest_extra=self.manifest_extra)

    def abort(self, messages):
        self.core._abort_run(messages)


class TokcodecStreamWriter(DataSourceStreamArrowWriter):
    """``df.writeStream.format("tokcodec")`` — each micro-batch
    commits as its OWN epoch (epoch = batchId), exactly the
    stream_encode/foreachBatch layout, so as_of_epoch time travel,
    since_epoch CDC reads and the readStream source all compose with
    this sink. A replayed batch (restart before the streaming commit
    log advanced) re-commits the same epoch under fresh run_ids and
    the per-(bucket, epoch) latest-run-wins dedup keeps the result
    exactly-once.

    Tasks don't know their batchId (only commit() receives it), so
    each task mints its OWN run_id and the commit groups messages by
    it: one run manifest per task, all committed at the batch's
    epoch. That keeps run manifests O(task files) and leaves the
    single-writer-per-run invariant intact."""

    def __init__(self, options: dict, schema: T.StructType,
                 overwrite: bool):
        if overwrite:
            raise ValueError(
                "tokcodec streaming sink supports append mode only")
        path = options.get("path") or options.get("paths")
        if not path:
            raise ValueError("tokcodec sink needs a path (.option("
                             "'path', ...) or .start(path))")
        self.options = dict(options)
        self.schema = schema
        self.path = path
        if _exists(posixpath.join(path, "_manifest.json")):
            manifest = _read_json(posixpath.join(path,
                                                 "_manifest.json"))
            if manifest["ddl"] != schema.simpleString():
                raise ValueError(
                    "schema mismatch on streaming append: table has "
                    f"{manifest['ddl']!r}, got "
                    f"{schema.simpleString()!r}")
            if manifest.get("uuid_columns") or manifest.get(
                    "enum_columns"):
                raise ValueError(
                    "the DataSource sink does not handle uuid/enum "
                    "conversion — use stream_encode")
        # fail fast on bad options (driver-side), before any task runs
        _WriterCore(schema, path, "optioncheck", options)

    def write(self, iterator):
        import uuid as _uuid

        core = _WriterCore(self.schema, self.path,
                           f"s{_uuid.uuid4().hex[:12]}", self.options)
        return core._write_partition(iterator)

    def commit(self, messages, batchId: int):
        core = _WriterCore(self.schema, self.path, "commit",
                           self.options)
        by_run: dict[str, list[dict]] = {}
        for m in messages:
            if m is not None and m.files:
                by_run.setdefault(m.run_id, []).extend(m.files)
        if not by_run:
            return
        # all run manifests first, then ONE lineage append — the
        # micro-batch lands atomically across its tasks' runs
        for rid, files in sorted(by_run.items()):
            core._write_run_manifest(rid, files, int(batchId))
        core.run_id = sorted(by_run)[0]
        all_files = [f for _rid, fl in sorted(by_run.items())
                     for f in fl]
        floor = 0
        if _exists(posixpath.join(self.path, "_manifest.json")):
            floor = int(_read_json(posixpath.join(
                self.path, "_manifest.json")).get("n_buckets", 0))
        core._commit_files(all_files, int(batchId),
                           n_buckets_floor=floor)

    def abort(self, messages, batchId: int):
        core = _WriterCore(self.schema, self.path, "abort",
                           self.options)
        core._abort_run(messages)


class TokcodecDataSource(DataSource):
    """Register once per session:
    ``spark.dataSource.register(TokcodecDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "tokcodec"

    def schema(self):
        path = self.options.get("path") or self.options.get("paths")
        if not path:
            raise ValueError("tokcodec source needs a path: "
                             ".load('/table/path')")
        manifest = _read_json(posixpath.join(path, "_manifest.json"))
        # uuid columns surface as 16-byte binary through this source
        # (the stored representation); use read_encoded for canonical
        # string expansion
        return manifest_schema(manifest)

    def reader(self, schema: T.StructType) -> TokcodecBatchReader:
        if str(self.options.get("pushdown", "")).lower() == "true":
            return TokcodecPushdownBatchReader(self.options, schema)
        return TokcodecBatchReader(self.options, schema)

    def streamReader(self, schema: T.StructType) -> TokcodecStreamReader:
        return TokcodecStreamReader(self.options, schema)

    def writer(self, schema: T.StructType,
               overwrite: bool) -> TokcodecBatchWriter:
        return TokcodecBatchWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: T.StructType,
                     overwrite: bool) -> TokcodecStreamWriter:
        return TokcodecStreamWriter(self.options, schema, overwrite)
