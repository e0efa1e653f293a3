"""Nested-shape round-trip (FIXTURES.md F3; reference list/map suites
CarpetWriterCollection*Test / CarpetWriterMapTest re-expressed):
struct, list<struct>, map, list<list<int>> columns through the engine."""

import pytest
from pyspark.sql import functions as F

from tokcodec import verify_roundtrip
from tokcodec.decode import decode_blocks
from tokcodec.encode import encode_table

DDL = (
    "id string, "
    "meta struct<a: int, b: string>, "
    "chunks array<struct<sku: string, qty: int>>, "
    "tags map<string, int>, "
    "grid array<array<int>>"
)


def _rows(n):
    out = []
    for i in range(n):
        out.append((
            f"d{i:05d}",
            (i, f"name{i % 7}") if i % 11 else None,
            [(f"sku{j}", i * 10 + j) for j in range(i % 4)],
            {f"k{j}": i + j for j in range(i % 3 + 1)},
            [[i, i + 1], [], [i * 2]] if i % 5 else [],
        ))
    return out


@pytest.fixture(scope="module")
def nested_df(spark):
    return spark.createDataFrame(_rows(3000), DDL).cache()


def test_nested_roundtrip(spark, nested_df):
    blocks = encode_table(nested_df, n_buckets=4)
    dec = decode_blocks(blocks, nested_df.schema)
    res = verify_roundtrip(nested_df, dec, key="id")
    assert res["ok"], res
    assert res["rows"] == 3000


def test_nested_projection(spark, nested_df):
    blocks = encode_table(nested_df, n_buckets=4)
    dec = decode_blocks(blocks, nested_df.schema, columns=["id", "chunks"])
    assert dec.columns == ["id", "chunks"]
    orig = nested_df.select("id", "chunks")
    assert verify_roundtrip(orig, dec, key="id")["ok"]


def test_nested_schema_preserved(spark, nested_df):
    blocks = encode_table(nested_df, n_buckets=2)
    dec = decode_blocks(blocks, nested_df.schema)
    assert dec.schema == nested_df.schema


def test_deep_nesting_map_mode(spark, nested_df):
    blocks = encode_table(nested_df, n_buckets=4, mode="map")
    dec = decode_blocks(blocks, nested_df.schema)
    assert verify_roundtrip(nested_df, dec, key="id")["ok"]


def test_nested_with_empty_and_null_collections(spark):
    df = spark.createDataFrame(
        [("a", [], {}), ("b", None, None), ("c", [1, 2], {"x": 1})],
        "id string, xs array<int>, m map<string, int>",
    )
    blocks = encode_table(df, n_buckets=2)
    dec = decode_blocks(blocks, df.schema)
    assert verify_roundtrip(df, dec, key="id")["ok"]

def test_decimal_roundtrip(spark):
    from decimal import Decimal

    rows = [(f"d{i}", Decimal(i * 7 - 500) / Decimal(100),
             None if i % 9 == 0 else Decimal(i) * Decimal("0.001"))
            for i in range(2000)]
    df = spark.createDataFrame(
        rows, "id string, price decimal(12,2), rate decimal(18,6)"
    )
    from tokcodec.encode import encode_table
    from tokcodec.decode import decode_blocks
    from tokcodec import verify_roundtrip

    blocks = encode_table(df, n_buckets=3)
    dec = decode_blocks(blocks, df.schema)
    res = verify_roundtrip(df, dec, key="id")
    assert res["ok"], res
    assert dec.schema == df.schema


def test_decimal_precision_19_encodes(spark):
    # precision > 18 was a v0 limit; now stored as fixed 16-byte
    # binary (see test_decimal_uuid.py for the round-trip suite)
    from decimal import Decimal

    df = spark.createDataFrame([("a", Decimal(1))], "id string, v decimal(19,0)")
    from tokcodec.encode import encode_table

    assert encode_table(df, n_buckets=1).count() > 0
