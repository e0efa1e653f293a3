"""Aggregate pushdown over encoded tables — COUNT / COUNT(col) /
SUM / MIN / MAX answered from per-chunk small materialized aggregates
(Moerkotte, VLDB'98; ≙ DuckDB/parquet answering min/max/count from
row-group stats) with NO decode of fully-covered chunks.

Every top-level scalar chunk's ``values`` block meta carries the zone
bounds [lo, hi] (since r1), the exact null count (``nulls``, r5) and
an overflow-guarded exact value sum (``sum``, r5 — int lanes only).
``aggregate_encoded`` plans like the readers do (lineage -> committed
chunk set -> per-filter survivor intersection), then splits the
surviving chunks:

  * FULLY-COVERED chunks — every filter's zone proves every row
    passes (lo >= flo and hi <= fhi, and the filter column has zero
    nulls in the chunk) — are aggregated from METADATA alone:
    rows += n_rows, nonnull += n_rows - nulls, sum += sum,
    min/max fold lo/hi. No payload is read, nothing is decoded.
  * PARTIAL chunks (filter boundary, missing stats, all-null with
    unknown counts) are decoded through read_encoded restricted to
    exactly that chunk set (broadcast semi-join) with the exact
    residual applied — correctness never depends on the stats.

At 100 TB the fast path turns "SUM(x) WHERE day BETWEEN a AND b" into
a metadata-only job plus a decode of the two boundary chunks per
bucket; the worst case (nothing covered) degenerates to the plain
filtered read the user would have run anyway.

Soundness notes: the metadata path is disabled wholesale when the
table has pending equality deletes (merge-on-read would drop rows the
stats still count), when evolution null-fill is active for any
involved column (fill rows have no block rows), or when the agg or a
filter column is encrypted (stats live in the sealed emeta envelope);
those cases route through the ordinary exact read. Coverage is only
claimed for int-lane range/in filters — float filters (NaN rows fail
residuals but are invisible to finite zone bounds), string prefix
bounds, bloom eq and contains filters mark all their survivors
partial. The reference has no aggregate machinery at all — parquet
consumers get this from their engine's row-group stats; this is the
encoded layout's native answer.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from tokcodec.io_tables import (
    _active_deletes,
    _as_filter_list,
    _blocks_df,
    _evolution_fill_columns,
    _filter_survivors,
    _load_table,
    _normalize_filter,
    _resolve_as_of,
    _run_files,
    read_encoded,
)
from tokcodec.schema import manifest_schema

_INT_LANES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _decode_path(spark, path, column, filts_kw, scale) -> dict:
    """Exact fallback: ordinary filtered read + aggregate."""
    df = read_encoded(spark, path, columns=[column], **filts_kw)
    r = df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.count(column).alias("nonnull"),
        F.sum(F.col(column).cast("decimal(38," + str(scale) + ")"))
        .alias("s"),
        F.min(column).alias("mn"),
        F.max(column).alias("mx"),
    ).collect()[0]
    return {"rows": int(r["rows"]), "nonnull": int(r["nonnull"]),
            "sum": r["s"], "min": r["mn"], "max": r["mx"]}


def aggregate_encoded(
    spark: SparkSession, path: str, column: str,
    range_filter=None, in_filter=None, eq_filter=None,
    contains_filter=None,
    encryption_key: bytes | None = None,
    as_of_epoch: int | None = None, as_of_ts=None,
    as_of_tag: str | None = None, since_epoch: int | None = None,
) -> dict:
    """Exact ``{rows, nonnull, sum, min, max}`` of one int/decimal
    column under the readers' filter surface, plus telemetry
    ``{chunks_total, chunks_scanned, chunks_meta, chunks_decoded}``
    (chunks_meta answered without decoding anything). Filters take
    the same shapes read_encoded does. SQL alignment: ``rows`` is
    COUNT(*), ``nonnull`` is COUNT(column); ``sum``/``min``/``max``
    are NULL (None) when no non-null row passes.
    """
    as_of_epoch = _resolve_as_of(spark, path, as_of_epoch, as_of_ts,
                                 as_of_tag)
    manifest, lin = _load_table(spark, path, as_of_epoch=as_of_epoch,
                                since_epoch=since_epoch)
    schema = manifest_schema(manifest)
    by_name = {f.name: f for f in schema.fields}
    if column not in by_name:
        raise ValueError(f"column {column!r} not in encoded table")
    dt = by_name[column].dataType
    scale = 0
    if isinstance(dt, T.DecimalType):
        if dt.precision > 18:
            raise ValueError(
                f"aggregate_encoded: decimal({dt.precision},{dt.scale})"
                " stores as opaque 16-byte binary — no sum stats; read"
                " + aggregate instead")
        scale = dt.scale
    elif not isinstance(dt, _INT_LANES):
        raise ValueError(
            f"aggregate_encoded supports int and decimal(<=18) "
            f"columns; {column!r} is {dt.simpleString()} — read + "
            "aggregate instead")

    filts: list[tuple[str, tuple]] = []
    for rf in _as_filter_list(range_filter):
        filts.append(("range", rf))
    if in_filter is not None:
        filts.append(("in", tuple(in_filter)))
    if eq_filter is not None:
        filts.append(("eq", tuple(eq_filter)))
    if contains_filter is not None:
        filts.append(("contains", tuple(contains_filter)))
    fcols = []
    for _, spec in filts:
        if spec[0] not in by_name:
            raise ValueError(
                f"filter column {spec[0]!r} not in encoded table")
        if spec[0] not in fcols:
            fcols.append(spec[0])
    filts_kw = dict(range_filter=range_filter, in_filter=in_filter,
                    eq_filter=eq_filter, contains_filter=contains_filter,
                    encryption_key=encryption_key,
                    as_of_epoch=as_of_epoch, since_epoch=since_epoch)

    def _to_logical(x):
        if x is None:
            return None
        return (Decimal(int(x)).scaleb(-scale) if scale
                else int(x)) if isinstance(dt, T.DecimalType) \
            else int(x)

    lin_rows = [(int(r.bucket), r.run_id) for r in lin.collect()]
    run_ids = sorted({rid for _, rid in lin_rows})
    files = _run_files(spark, path, run_ids)
    involved = set([column] + fcols)
    enc_cols = set(manifest.get("encrypted_columns", []))
    dels = _active_deletes(spark, path, as_of_epoch=as_of_epoch)
    if dels or (involved & enc_cols) \
            or _evolution_fill_columns(files, involved):
        out = _decode_path(spark, path, column, filts_kw, scale)
        out["sum"] = None if out["sum"] is None else (
            out["sum"] if scale else int(out["sum"]))
        out.update(chunks_meta=0, chunks_decoded=None,
                   path="decode")
        return out

    lin_local = spark.createDataFrame(lin_rows,
                                      "bucket int, run_id string")
    blocks = _blocks_df(spark, path, lin_local,
                        columns_needed=involved, files=files).persist()
    try:
        keys = ["run_id", "bucket", "chunk"]
        # ---- survivor intersection (the readers' own pruning)
        surv = None
        for kind, spec in filts:
            s, _res = _filter_survivors(blocks, schema, manifest, kind,
                                        spec,
                                        encryption_key=encryption_key)
            surv = s if surv is None else surv.join(F.broadcast(s),
                                                    keys, "inner")
        # ---- one meta pivot per surviving chunk
        vals = blocks.filter((F.col("component") == "values")
                             & F.col("column").isin(list(involved)))
        if surv is not None:
            vals = vals.join(F.broadcast(surv), keys, "left_semi")

        def _j(c, fld, t="long"):
            return F.max(F.when(
                F.col("column") == c,
                F.get_json_object("meta", f"$.{fld}").cast(t)))

        aggs = [
            F.max(F.when(F.col("column") == column,
                         F.col("n_rows"))).alias("n"),
            _j(column, "lo").alias("a_lo"),
            _j(column, "hi").alias("a_hi"),
            _j(column, "nulls").alias("a_nulls"),
            _j(column, "sum").alias("a_sum"),
        ]
        cov = F.lit(True)
        for i, (kind, spec) in enumerate(filts):
            nf = _normalize_filter(schema, manifest, kind, spec,
                                   make_residual=False)
            c = nf["col"]
            if nf["kind"] != "zone" or nf["lane"] != "int" \
                    or kind not in ("range", "in"):
                cov = cov & F.lit(False)  # bloom/str/float: partial
                continue
            aggs += [_j(c, "lo").alias(f"f{i}_lo"),
                     _j(c, "hi").alias(f"f{i}_hi"),
                     _j(c, "nulls").alias(f"f{i}_nulls")]
            lo, hi, nl = (F.col(f"f{i}_lo"), F.col(f"f{i}_hi"),
                          F.col(f"f{i}_nulls"))
            if kind == "range":
                (flo, fhi), = nf["bounds"]
                c_ok = (lo >= F.lit(int(flo))) & (hi <= F.lit(int(fhi)))
            else:  # in: single-valued chunk whose value is probed
                probes = [int(zv) for zv, _ in nf["bounds"]]
                c_ok = (lo == hi) & lo.isin(probes)
            cov = cov & lo.isNotNull() & c_ok & (nl == 0)
        per_chunk = vals.groupBy(*keys).agg(*aggs)
        # metadata-answerable: covered by every filter AND the agg
        # column's own stats are complete (nulls known; sum known or
        # the chunk is all-null, contributing 0)
        meta_ok = (cov & F.col("a_nulls").isNotNull()
                   & (F.col("a_sum").isNotNull()
                      | (F.col("a_nulls") == F.col("n"))))
        per_chunk = per_chunk.withColumn("meta_ok", meta_ok).persist()
        m = per_chunk.filter("meta_ok").agg(
            F.count(F.lit(1)).alias("c"),
            F.sum("n").alias("rows"),
            F.sum(F.col("n") - F.col("a_nulls")).alias("nonnull"),
            F.sum(F.col("a_sum").cast("decimal(38,0)")).alias("s"),
            F.min("a_lo").alias("mn"), F.max("a_hi").alias("mx"),
        ).collect()[0]
        # materialize the partial set while blocks is still cached:
        # the decode job re-plans from it without re-deriving the
        # pivot (localCheckpoint also severs the lineage so the
        # broadcast semi-join below is a plain small scan)
        partial = (per_chunk.filter(~F.col("meta_ok")).select(*keys)
                   .localCheckpoint(eager=True))
        n_partial = partial.count()
        n_scanned = int(m["c"] or 0) + n_partial
        n_total = int(blocks.filter(
            (F.col("component") == "values")
            & (F.col("column") == column)).count())
    finally:
        blocks.unpersist()
        try:
            per_chunk.unpersist()
        except NameError:
            pass

    rows = int(m["rows"] or 0)
    nonnull = int(m["nonnull"] or 0)
    total_sum = int(m["s"]) if m["s"] is not None else 0
    mn = m["mn"]
    mx = m["mx"]
    if n_partial:
        d = _decode_path(spark, path, column,
                         dict(filts_kw, _chunk_subset=partial), scale)
        rows += d["rows"]
        nonnull += d["nonnull"]
        if d["sum"] is not None:
            ds = d["sum"]
            total_sum += int(ds.scaleb(scale)) if scale else int(ds)
        for v, pick in ((d["min"], min), (d["max"], max)):
            if v is not None:
                sv = int(Decimal(v).scaleb(scale)) if scale else int(v)
                mn = sv if pick is min and (mn is None or sv < mn) \
                    else mn
                mx = sv if pick is max and (mx is None or sv > mx) \
                    else mx
    return {
        "rows": rows, "nonnull": nonnull,
        "sum": _to_logical(total_sum) if nonnull else None,
        "min": _to_logical(mn) if nonnull else None,
        "max": _to_logical(mx) if nonnull else None,
        "chunks_total": n_total, "chunks_scanned": n_scanned,
        "chunks_meta": int(m["c"] or 0), "chunks_decoded": n_partial,
        "path": "meta+decode" if n_partial else "meta",
    }
