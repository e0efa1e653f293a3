"""DECIMAL(precision > 18) and UUID-as-FIXED(16) round-trips —
reference parity for BigDecimalWrite.java:58-70 (BINARY unscaled
decimals) and UuidWrite.java:25-32 (FIXED_LEN_BYTE_ARRAY(16))."""

import os
import uuid as uuidlib
from decimal import Decimal

from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from tokcodec.io_tables import read_encoded, write_encoded


def test_decimal38_roundtrip(spark, tmp_path):
    schema = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("amt", T.DecimalType(38, 10), True),
    ])
    vals = [
        Decimal("1234567890123456789012345678.0123456789"),
        Decimal("-9999999999999999999999999999.9999999999"),
        Decimal("0.0000000001"),
        Decimal("-1"),
        None,
        Decimal("0"),
    ]
    df = spark.createDataFrame(
        [Row(doc_id=f"d{i}", amt=v) for i, v in enumerate(vals)], schema
    )
    path = os.path.join(str(tmp_path), "t")
    write_encoded(df, path, n_buckets=2, run_id="dec")
    out = {r["doc_id"]: r["amt"] for r in read_encoded(spark, path).collect()}
    for i, v in enumerate(vals):
        assert out[f"d{i}"] == v, (i, out[f"d{i}"], v)


def test_decimal38_in_list(spark, tmp_path):
    schema = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("amts", T.ArrayType(T.DecimalType(20, 2), True), False),
    ])
    rows = [
        Row(doc_id="a", amts=[Decimal("123456789012345678.99"), None]),
        Row(doc_id="b", amts=[Decimal("-0.01")]),
    ]
    df = spark.createDataFrame(rows, schema)
    path = os.path.join(str(tmp_path), "t2")
    write_encoded(df, path, n_buckets=1, run_id="dec2")
    out = {r["doc_id"]: r["amts"] for r in read_encoded(spark, path).collect()}
    assert out["a"] == [Decimal("123456789012345678.99"), None]
    assert out["b"] == [Decimal("-0.01")]


def test_uuid_fixed16_roundtrip(spark, tmp_path):
    rng_uuids = [str(uuidlib.UUID(int=i * 0x1337C0DE + 7)) for i in range(50)]
    schema = T.StructType([
        T.StructField("id", T.StringType(), True),
        T.StructField("n", T.IntegerType(), False),
    ])
    rows = [Row(id=u, n=i) for i, u in enumerate(rng_uuids)]
    rows.append(Row(id=None, n=999))
    df = spark.createDataFrame(rows, schema)
    path = os.path.join(str(tmp_path), "t3")
    write_encoded(df, path, n_buckets=2, run_id="uu", uuid_columns=["id"])
    dec = read_encoded(spark, path)
    out = {r["n"]: r["id"] for r in dec.collect()}
    for i, u in enumerate(rng_uuids):
        assert out[i] == u, (i, out[i], u)
    assert out[999] is None
    # stored payload is 16-byte binary, not 36-char text: the id
    # column's stored orig_bytes reflect the fixed-width layout
    blocks = spark.read.option("recursiveFileLookup", "true").parquet(
        os.path.join(path, "blocks"))
    vals = blocks.filter(
        (F.col("column") == "id") & (F.col("component") == "values")
    ).agg(F.sum("orig_bytes")).collect()[0][0]
    assert vals <= 17 * 51  # 16 bytes/value + packed length bits


def test_enum_columns_validate(spark, tmp_path):
    # enum-as-type (reference EnumsValues): dict codec stores each
    # symbol once; the declared value set is enforced per chunk
    import json

    import pytest
    from pyspark.sql import Row
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("status", T.StringType(), True),
    ])
    ok = spark.createDataFrame(
        [Row(doc_id=f"d{i}", status=["NEW", "DONE", None][i % 3])
         for i in range(30)], schema)
    path = os.path.join(str(tmp_path), "en")
    write_encoded(ok, path, n_buckets=2, run_id="e",
                  enum_columns={"status": ["NEW", "DONE", "FAILED"]})
    out = read_encoded(spark, path)
    assert out.count() == 30
    with open(os.path.join(path, "_manifest.json")) as f:
        assert json.load(f)["enum_columns"] == {
            "status": ["NEW", "DONE", "FAILED"]}

    bad = spark.createDataFrame(
        [Row(doc_id="x", status="BOGUS")], schema)
    with pytest.raises(Exception, match="BOGUS"):
        write_encoded(bad, os.path.join(str(tmp_path), "en2"), n_buckets=1,
                      run_id="e2",
                      enum_columns={"status": ["NEW", "DONE", "FAILED"]})


def test_uuid_eq_filter_and_validation(spark, tmp_path):
    # review findings: eq_filter on a uuid column must probe with the
    # stored 16-byte form, and malformed uuid values must fail the
    # write loudly instead of silently nulling
    import uuid as uuidlib

    import pytest
    from pyspark.sql import Row

    us = [str(uuidlib.UUID(int=i * 101 + 5)) for i in range(200)]
    df = spark.createDataFrame(
        [Row(id=u, n=i) for i, u in enumerate(us)], "id string, n int")
    path = os.path.join(str(tmp_path), "ue")
    write_encoded(df, path, n_buckets=2, run_id="u", chunk_max_rows=32,
                  uuid_columns=["id"], bloom_columns=["id"])
    hit = read_encoded(spark, path, eq_filter=("id", us[123])).collect()
    assert len(hit) == 1 and hit[0]["n"] == 123 and hit[0]["id"] == us[123]
    assert read_encoded(
        spark, path, eq_filter=("id", str(uuidlib.UUID(int=10**30)))
    ).count() == 0

    bad = spark.createDataFrame([Row(id="doc-000123", n=1)],
                                "id string, n int")
    with pytest.raises(Exception, match="not a canonical UUID"):
        write_encoded(bad, os.path.join(str(tmp_path), "ub"), n_buckets=1,
                      run_id="b", uuid_columns=["id"])


def test_zone_filter_rejects_unzonable(spark, tmp_path):
    """Zone filters cover int/float/date/timestamp/string/binary
    lanes; a nested column (no zone maps) is rejected, a float range
    filter works (float zones landed in abf7b3a), and int bounds
    against a string column fail loudly instead of building garbage
    byte bounds."""
    import pytest
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(doc_id="a", n=1, x=1.5, tok=[1, 2])],
        "doc_id string, n int, x double, tok array<int>")
    path = os.path.join(str(tmp_path), "zi")
    write_encoded(df, path, n_buckets=1, run_id="z")
    with pytest.raises(ValueError, match="zone maps"):
        read_encoded(spark, path, range_filter=("tok", 0, 10))
    assert read_encoded(
        spark, path, range_filter=("x", 0.0, 10.0)).count() == 1
    assert read_encoded(
        spark, path, range_filter=("x", 2.0, 10.0)).count() == 0
    with pytest.raises(ValueError, match="must be str or bytes"):
        read_encoded(spark, path, range_filter=("doc_id", 0, 10)).count()
    with pytest.raises(ValueError, match="must be str or bytes"):
        read_encoded(spark, path, in_filter=("doc_id", [1])).count()
