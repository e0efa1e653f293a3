"""tokcodec as a Spark DATA SOURCE (Spark 4 Python DataSource API):

    from tokcodec.datasource import TokcodecDataSource
    spark.dataSource.register(TokcodecDataSource)

    spark.read.format("tokcodec").load("/data/enc")          # batch
    spark.readStream.format("tokcodec").load("/data/enc")    # CDC

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

Options: ``path`` (or load(path)), ``encryption_key_hex``,
``as_of_epoch``, ``since_epoch`` (batch: epoch window;
stream: starting offset)."""

from __future__ import annotations

import json
import posixpath

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
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
        flist = [(fp, col) for lo, hi, fp, col in rows
                 if lo <= bucket <= hi]
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
        with fs.open_input_file(posixpath.join(blocks_root, rel)) as f:
            t = pq.read_table(f, filters=[
                ("bucket", "=", part.bucket),
                ("run_id", "in", sorted(set(part.runs))),
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
    subset; every filter is ALSO re-applied by Spark)."""
    from tokcodec.io_tables import _normalize_filter

    specs = []
    for f in filters:
        try:
            if len(f.attribute) != 1:
                continue
            col = f.attribute[0]
            fld = next((x.dataType for x in schema.fields
                        if x.name == col), None)
            if fld is None:
                continue
            one_sided = isinstance(
                f, (GreaterThan, GreaterThanOrEqual, LessThan,
                    LessThanOrEqual))
            if one_sided and isinstance(fld, (T.StringType,
                                              T.BinaryType)):
                # no safe upper/lower sentinel exists for truncated
                # string bounds — Spark applies the predicate anyway
                continue
            if isinstance(f, EqualTo):
                if isinstance(fld, T.StringType) and isinstance(
                        f.value, str):
                    nf = _normalize_filter(schema, manifest, "eq",
                                           (col, f.value),
                                           make_residual=False)
                else:
                    nf = _normalize_filter(schema, manifest, "range",
                                           (col, f.value, f.value),
                                           make_residual=False)
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                nf = _normalize_filter(
                    schema, manifest, "range",
                    (col, f.value, _lane_max(fld)),
                    make_residual=False)
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                nf = _normalize_filter(
                    schema, manifest, "range",
                    (col, _lane_min(fld), f.value),
                    make_residual=False)
            else:
                continue
        except (ValueError, TypeError, OverflowError):
            continue  # unprunable shape — Spark still applies it
        specs.append({k: v for k, v in nf.items() if k != "residual"})
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
