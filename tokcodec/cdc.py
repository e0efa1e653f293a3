"""Changelog (CDC) reads over encoded tables — the Iceberg
``create_changelog_view`` analogue for the epoch lineage + equality-
delete log.

``changes_encoded(path, since_epoch=N)`` answers "what changed since
my checkpoint" as a NET change stream: one row per change with a
leading ``_change_type`` column —

  * ``insert`` — rows appended by epochs in ``(since, as_of]``, with
    every delete in force at ``as_of`` already applied (a row that
    was appended AND deleted inside the window nets to nothing, and a
    row born dead under the documented GLOBAL removal-list semantics
    never appears);
  * ``delete`` — the full content of rows that were VISIBLE at the
    ``since`` snapshot and are removed by a delete committed inside
    the window (looked up from the ``as_of_epoch=since`` snapshot by
    key semi-join, so already-gone rows are never re-deleted).

A consumer that applied the ``since`` snapshot replays the stream —
apply deletes by key, append inserts — and holds exactly the
``as_of`` snapshot; that invariant is what the tests pin. Without
``since_epoch`` the stream degenerates to the full net state (all
inserts, no deletes) — the bootstrap read.

Scale shape: inserts are the ordinary incremental read (explicit file
plan over the window's run manifests — O(window), not O(history));
each delete lookup is one snapshot scan semi-joined against the key
file (broadcast under DELETE_BROADCAST_MAX_KEYS, shuffled past it),
and the key files a 100 TB table accumulates are the small side by
construction. Deviation from Iceberg, documented: per-row change
ordering inside the window is not exposed (no ``_epoch`` column) —
the window is the granularity, matching the removal-list delete
model. Rewrites inside the window (compact_encoded, upsert_encoded's
copy-on-write buckets) inherit the incremental-read re-emission
caveat: rewritten rows re-appear as inserts without pre-image
deletes, so checkpoint BEFORE maintenance windows (the same advice
Iceberg gives for rewrite_data_files vs changelog scans).

Reference: Carpet has no table format, so no changelog; this is the
engine-side completion of delete_encoded/since_epoch (SURVEY §2.1
maintenance set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from tokcodec.io_tables import (
    _active_deletes,
    _as_of_schema,
    _delete_keys_df,
    _load_table,
    _resolve_as_of,
    _run_files,
    read_encoded,
)
from tokcodec.schema import manifest_schema

CHANGE_COL = "_change_type"


def _snapshot_names(spark, path, epoch) -> set[str]:
    """Column names visible in the ``as_of_epoch=epoch`` snapshot
    (the same snapshot-schema projection read_encoded applies)."""
    manifest, lin = _load_table(spark, path, as_of_epoch=epoch)
    run_ids = sorted({r.run_id for r in lin.collect()})
    _files, run_schemas = _run_files(spark, path, run_ids,
                                     with_schemas=True)
    snap = _as_of_schema(manifest_schema(manifest), run_schemas)
    return {f.name for f in snap.fields}


def changes_encoded(
    spark: SparkSession, path: str,
    since_epoch: int | None = None,
    as_of_epoch: int | None = None, as_of_ts=None,
    as_of_tag: str | None = None,
    columns: list[str] | None = None,
    encryption_key: bytes | None = None,
) -> DataFrame:
    """Net change stream of ``(since_epoch, as_of]`` — see module
    docstring. ``columns`` projects both the insert and delete rows
    (delete-key columns are read internally and dropped when not
    requested)."""
    as_of_epoch = _resolve_as_of(spark, path, as_of_epoch, as_of_ts,
                                 as_of_tag)
    ins = read_encoded(spark, path, columns=columns,
                       since_epoch=since_epoch,
                       as_of_epoch=as_of_epoch,
                       encryption_key=encryption_key)
    out = ins.select(F.lit("insert").alias(CHANGE_COL), "*")
    if since_epoch is None:
        return out
    win = [d for d in _active_deletes(spark, path,
                                      as_of_epoch=as_of_epoch)
           if d["epoch"] > int(since_epoch)]
    if not win:
        return out
    by_col: dict[str, list[dict]] = {}
    for d in win:
        by_col.setdefault(d["key_column"], []).append(d)
    snap_names = _snapshot_names(spark, path, since_epoch)
    for col, ds in sorted(by_col.items()):
        if col not in snap_names:
            # the key column postdates the snapshot: no visible row
            # can match the equality delete — nothing to emit
            continue
        # read only snapshot-visible columns; requested columns the
        # snapshot predates come back as NULLs on the delete rows
        # (the pre-image had no value), via allowMissingColumns below
        snap_cols = columns
        if columns is not None:
            snap_cols = [c for c in columns if c in snap_names]
            if col not in snap_cols:
                snap_cols = snap_cols + [col]
        snap = read_encoded(spark, path, columns=snap_cols,
                            as_of_epoch=since_epoch,
                            encryption_key=encryption_key)
        deleted = snap.join(_delete_keys_df(spark, path, ds),
                            [col], "left_semi")
        if columns is not None and col not in columns:
            deleted = deleted.drop(col)
        out = out.unionByName(
            deleted.select(F.lit("delete").alias(CHANGE_COL), "*"),
            allowMissingColumns=True)
    return out
