"""Static schemas for the engine (≙ reference JavaRecord2Schema: the
schema is fixed by declaration at write time, validated at read time;
reference impl/write/JavaRecord2Schema.java:88-126)."""

from __future__ import annotations

import json

import pyarrow as pa
from pyspark.sql import types as T

# canonical input table (BASELINE.json input_hint)
SEQ_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)

# one row per (bucket, chunk, column, component) encoded block.
# chunks bound encoder memory and isolate skewed giant rows; all
# components of one (bucket, chunk) align positionally. run_id makes
# re-runs after partial failure unambiguous (decode only reads the
# run committed in lineage for each bucket).
BLOCK_DDL = (
    "run_id string, bucket int, chunk int, column string, component string, "
    "codec string, n_rows bigint, payload binary, meta string, "
    "orig_bytes bigint, enc_bytes bigint, checksum bigint"
)

# per-bucket lineage/metrics (BASELINE.json north_star: codec chosen,
# ratio, bytes in/out, checkpoint offset)
# epoch: 0 for batch (re-)encodes — one winning run per bucket; a
# streaming micro-batch id for appends — winner per (bucket, epoch),
# so redelivered batches are idempotent while distinct batches union.
LINEAGE_DDL = (
    "run_id string, bucket int, epoch bigint, status string, n_rows bigint, "
    "orig_bytes bigint, enc_bytes bigint, ratio double, "
    "codecs string, checksum bigint, offset bigint, wall_ms double, "
    "ts double"
)


def spark_type_to_arrow(dt: T.DataType) -> pa.DataType:
    m = {
        T.BooleanType: pa.bool_(),
        T.ByteType: pa.int8(),
        T.ShortType: pa.int16(),
        T.IntegerType: pa.int32(),
        T.LongType: pa.int64(),
        T.FloatType: pa.float32(),
        T.DoubleType: pa.float64(),
        T.StringType: pa.string(),
        T.DateType: pa.date32(),
        T.TimestampType: pa.timestamp("us", tz="UTC"),
        T.TimestampNTZType: pa.timestamp("us"),
        # TIME logical type (reference TimeWrite.java:46-52,
        # LogicalTypeConverters.java:163-171): Spark 4.1 TimeType
        # crosses Arrow as time64[ns] regardless of declared precision
        T.TimeType: pa.time64("ns"),
        T.BinaryType: pa.binary(),
    }
    if type(dt) in m:
        return m[type(dt)]
    if isinstance(dt, T.DecimalType):
        return pa.decimal128(dt.precision, dt.scale)
    if isinstance(dt, T.ArrayType):
        # Spark's Arrow schema names the child "element" and carries
        # containsNull — must match exactly for applyInArrow results
        return pa.list_(
            pa.field("element", spark_type_to_arrow(dt.elementType),
                     nullable=dt.containsNull)
        )
    if isinstance(dt, T.StructType):
        return pa.struct(
            [pa.field(f.name, spark_type_to_arrow(f.dataType),
                      nullable=f.nullable) for f in dt.fields]
        )
    if isinstance(dt, T.MapType):
        return pa.map_(
            spark_type_to_arrow(dt.keyType),
            pa.field("value", spark_type_to_arrow(dt.valueType),
                     nullable=dt.valueContainsNull),
        )
    if isinstance(dt, T.VariantType):
        # Spark's variant-over-Arrow layout incl. the field-metadata
        # tag the JVM uses to map the struct back to VariantType
        # (pyspark to_arrow_type)
        return pa.struct([
            pa.field("value", pa.binary(), nullable=False),
            pa.field("metadata", pa.binary(), nullable=False,
                     metadata={b"variant": b"true"}),
        ])
    if isinstance(dt, (T.GeometryType, T.GeographyType)):
        kind = (b"geometry" if isinstance(dt, T.GeometryType)
                else b"geography")
        return pa.struct([
            pa.field("srid", pa.int32(), nullable=False),
            pa.field("wkb", pa.binary(), nullable=False,
                     metadata={kind: b"true",
                               b"srid": str(dt.srid).encode()}),
        ])
    raise NotImplementedError(f"unsupported type {dt}")


# storage layout generation. v2 = per-run file manifests under
# <table>/_runs/<run_id>.json: encode tasks write their own block files
# and report them, so commit metadata is O(run) and reads plan explicit
# file lists (lineage -> run manifests) with no directory listing.
LAYOUT_VERSION = 2


def schema_manifest(schema: T.StructType, n_buckets: int, run_id: str,
                    uuid_columns: list[str] | None = None,
                    enum_columns: dict[str, list[str]] | None = None,
                    encrypted_columns: list[str] | None = None,
                    bloom_columns: list[str] | None = None,
                    sketch_columns: list[str] | None = None,
                    salt_cols: list[str] | None = None) -> str:
    return json.dumps(
        {"layout": LAYOUT_VERSION,
         "ddl": schema.simpleString(), "json": schema.jsonValue(),
         "n_buckets": n_buckets, "run_id": run_id,
         # the columns content-hash bucketing salts on — the PROOF two
         # tables are co-partitioned (join_encoded). Empty/absent =
         # not content-bucketed (DataSource partition-id writes,
         # pre-field tables): co-bucketed joins refuse such tables
         "salt_cols": list(salt_cols or []),
         "uuid_columns": sorted(uuid_columns or []),
         "enum_columns": enum_columns or {},
         # which columns' payloads are AES-GCM encrypted — the list is
         # public metadata (plaintext-footer mode); the key never
         # touches the table
         "encrypted_columns": sorted(encrypted_columns or []),
         # ADVISORY index declarations (unlike the four lists above
         # they do not change row decoding): the columns the LAST
         # write bloom/sketch-indexed. compact_encoded / upsert reuse
         # them so maintenance rewrites keep the table's indexes
         # without the caller re-declaring them; readers never need
         # them (chunks without a bloom always survive)
         "bloom_columns": sorted(bloom_columns or []),
         "sketch_columns": sorted(sketch_columns or [])},
        separators=(",", ":"),
    )


def manifest_schema(manifest: dict) -> T.StructType:
    return T.StructType.fromJson(manifest["json"])
