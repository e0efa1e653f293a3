"""Vocabulary surgery: remap token ids across an encoded table.

Retokenization events — vocabulary pruning, BPE merge-table changes,
merging corpora tokenized with different vocabularies — need "apply
old_id -> new_id to every token in a 10^12-sequence table" as ONE
atomic, resumable-by-construction operation. Neither parquet nor the
reference (bigfei/parquet-carpet) has an in-place value rewrite; the
usual recipe is read -> transform -> write-elsewhere -> swap. Here it
rides compact_encoded's rewrite-time ``transform`` hook, so the remap
inherits the compaction contract: one fresh run at a new epoch,
tombstones + commits in ONE atomic lineage append (readers see the old
vocabulary or the new one, never a mix), blooms/sketches/zone maps of
the token column regenerated from the NEW ids, old files reclaimed by
vacuum.

Scale shape: the mapping broadcasts once as two sorted numpy arrays
(or one dense LUT when the old-id space is compact — O(1) take instead
of a binary search); each bucket's token arrays remap as a single
vectorized gather over the flattened values child, reusing the
decoded batch's offsets and validity buffers untouched. No per-row
Python, no extra shuffle beyond the rewrite's own salted repartition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import SparkSession
from pyspark.sql import types as T

_DENSE_LUT_MAX = 1 << 24  # dense LUT up to 16M ids (~128 MB int64)

_LANE_RANGE = {
    pa.int8(): (-(1 << 7), (1 << 7) - 1),
    pa.int16(): (-(1 << 15), (1 << 15) - 1),
    pa.int32(): (-(1 << 31), (1 << 31) - 1),
    pa.int64(): (-(1 << 63), (1 << 63) - 1),
}


def _build_lut(mapping: dict) -> dict:
    """Picklable mapping spec: dense numpy LUT when the old-id space
    is compact, sorted-pair binary search otherwise."""
    if not mapping:
        raise ValueError("remap mapping must be non-empty")
    old = np.fromiter(mapping.keys(), dtype=np.int64, count=len(mapping))
    new = np.fromiter(mapping.values(), dtype=np.int64, count=len(mapping))
    order = np.argsort(old)
    old, new = old[order], new[order]
    if len(np.unique(old)) != len(old):
        raise ValueError("remap mapping has duplicate old ids")
    if old[0] >= 0 and old[-1] < _DENSE_LUT_MAX \
            and old[-1] < 8 * len(old):  # dense enough to pay the RAM
        lut = np.full(int(old[-1]) + 1, _UNMAPPED, dtype=np.int64)
        lut[old] = new
        return {"kind": "dense", "lut": lut}
    return {"kind": "sorted", "old": old, "new": new}


_UNMAPPED = np.iinfo(np.int64).min


def _apply_lut(v: np.ndarray, spec: dict) -> np.ndarray:
    """Vectorized old->new over an int64 array; unmapped ids come back
    as the _UNMAPPED sentinel for the caller's policy to resolve."""
    if spec["kind"] == "dense":
        lut = spec["lut"]
        out = np.full(v.shape, _UNMAPPED, dtype=np.int64)
        in_range = (v >= 0) & (v < len(lut))
        out[in_range] = lut[v[in_range]]
        return out
    old, new = spec["old"], spec["new"]
    pos = np.searchsorted(old, v)
    pos_c = np.minimum(pos, len(old) - 1)
    hit = old[pos_c] == v
    out = np.full(v.shape, _UNMAPPED, dtype=np.int64)
    out[hit] = new[pos_c[hit]]
    return out


def _remap_array(arr: pa.Array, spec: dict, on_unmapped,
                 column: str) -> pa.Array:
    """Remap one Arrow column chunk (int scalar or list<int> lane),
    preserving offsets and validity buffers."""
    is_list = pa.types.is_list(arr.type) or pa.types.is_large_list(
        arr.type)
    child = arr.values if is_list else arr
    elem_t = child.type
    if elem_t not in _LANE_RANGE:
        raise ValueError(
            f"remap column {column!r} must be an int lane, "
            f"got {arr.type}")
    child_valid = None
    work = child
    if child.null_count:
        child_valid = child.is_valid().to_numpy(zero_copy_only=False)
        work = child.fill_null(0)
    v = work.cast(pa.int64()).to_numpy(zero_copy_only=False)
    mapped = _apply_lut(v, spec)
    un = mapped == _UNMAPPED
    if child_valid is not None:
        # null slots are not "unmapped", they're null: exclude them
        # from the policy and zero them (masked on rebuild anyway)
        un &= child_valid
        mapped[~child_valid] = 0
    if un.any():
        if on_unmapped == "error":
            bad = np.unique(v[un])[:10]
            raise ValueError(
                f"remap column {column!r}: {int(un.sum())} tokens have "
                f"no mapping (sample old ids: {bad.tolist()}); pass "
                "on_unmapped='keep' or a default id")
        if on_unmapped == "keep":
            mapped[un] = v[un]
        else:
            mapped[un] = int(on_unmapped)
    lo, hi = _LANE_RANGE[elem_t]
    mmin = int(mapped.min()) if len(mapped) else 0
    mmax = int(mapped.max()) if len(mapped) else 0
    if mmin < lo or mmax > hi:
        raise ValueError(
            f"remap column {column!r}: new ids span [{mmin}, {mmax}] "
            f"which does not fit the stored {elem_t} lane — widen the "
            "column first (read_encoded_as + a fresh write)")
    mask = None
    if child_valid is not None:
        mask = ~child_valid
    new_child = pa.array(mapped, type=pa.int64(), mask=mask).cast(elem_t)
    if not is_list:
        return new_child.cast(arr.type)
    cls = (pa.LargeListArray
           if pa.types.is_large_list(arr.type) else pa.ListArray)
    offsets = arr.offsets
    if arr.null_count:
        # from_arrays takes list validity through a mask over offsets
        lmask = ~arr.is_valid().to_numpy(zero_copy_only=False)
        # offsets of a nullable list array must pair with the mask
        out = cls.from_arrays(
            pa.array(offsets.to_numpy(zero_copy_only=False),
                     type=offsets.type, mask=None),
            new_child,
            mask=pa.array(lmask))
    else:
        out = cls.from_arrays(offsets, new_child)
    # exact-type cast: the batch field may carry element field names /
    # nullability flags from_arrays does not reproduce
    return out.cast(arr.type)


def make_remap_transform(column: str, mapping: dict,
                         on_unmapped="error"):
    """The compact_encoded ``transform`` hook for a token-id remap —
    usable standalone on any DataFrame via ``mapInArrow`` too."""
    spec = _build_lut(mapping)
    if on_unmapped not in ("error", "keep") \
            and not isinstance(on_unmapped, (int, np.integer)):
        raise ValueError(
            "on_unmapped must be 'error', 'keep' or an int id")

    def hook(batch: pa.RecordBatch) -> pa.RecordBatch:
        idx = batch.schema.get_field_index(column)
        if idx < 0:
            raise ValueError(f"remap column {column!r} not in batch "
                             f"schema {batch.schema.names}")
        new_col = _remap_array(batch.column(idx), spec, on_unmapped,
                               column)
        return batch.set_column(idx, batch.schema.field(idx), new_col)

    return hook


def remap_tokens(spark: SparkSession, path: str, column: str,
                 mapping: dict, on_unmapped="error",
                 run_id: str | None = None,
                 encryption_key: bytes | None = None,
                 **compact_kwargs) -> dict:
    """Apply ``mapping`` (old token id -> new token id) to every value
    of ``column`` (an int or array<int> column) across the whole
    encoded table, atomically.

    ``on_unmapped``: ``'error'`` (default — a vocabulary change must
    account for every id), ``'keep'`` (identity for ids outside the
    mapping — the partial-remap shape), or an int (the UNK id —
    vocabulary PRUNING maps every dropped id to it).

    Everything else is compact_encoded: new epoch, atomic supersede,
    re-derived zone maps / blooms / sketches over the NEW ids (the
    selector re-picks codecs — a remap that shrinks the id space
    upgrades bitpack widths for free), vacuum reclaims old files.
    ``compact_kwargs`` pass through (n_buckets, cluster_by, ...)."""
    from tokcodec.io_tables import compact_encoded, manifest_schema
    from tokcodec.io_tables import _load_table

    manifest, _ = _load_table(spark, path)
    schema = manifest_schema(manifest)
    fld = next((f for f in schema.fields if f.name == column), None)
    if fld is None:
        raise ValueError(
            f"column {column!r} not in encoded table "
            f"{schema.fieldNames()}")
    dt = fld.dataType
    elem = dt.elementType if isinstance(dt, T.ArrayType) else dt
    if not isinstance(elem, (T.ByteType, T.ShortType, T.IntegerType,
                             T.LongType)):
        raise ValueError(
            f"remap column {column!r} must be int or array<int>, "
            f"got {dt.simpleString()}")
    hook = make_remap_transform(column, mapping, on_unmapped)
    out = compact_encoded(spark, path, run_id=run_id,
                          encryption_key=encryption_key,
                          transform=hook, **compact_kwargs)
    out["remapped_column"] = column
    out["mapping_size"] = len(mapping)
    return out
