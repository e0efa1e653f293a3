"""Local mirror of the driver's correctness gate: run every
``queries()`` entry on Spark at sf0.01 and compare against
``oracle_sql()`` via DuckDB — row count, column names, and
order-insensitive values."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(v):
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (int,)):
        return int(v)
    return v


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=repr
    )


ORACLES = entrymod.oracle_sql()
ALL = entrymod.queries()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["source", "n_docs", "sum_tok", "tok_sum"]


@pytest.mark.parametrize("name", [n for n in ALL if n in ORACLES])
def test_query_matches_oracle(spark, ddb, name):
    sdf = ALL[name](spark, SF_DIR)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]
    res = ddb.execute(ORACLES[name])
    d_cols = [c[0].lower() for c in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols), (s_cols, d_cols)
    assert len(s_rows) == len(d_rows), (name, len(s_rows), len(d_rows))
    assert _rows_to_set(s_cols, s_rows) == _rows_to_set(d_cols, d_rows)


@pytest.mark.parametrize("name", [n for n in ALL if n not in ORACLES])
def test_rows_only_queries_run(spark, name):
    sdf = ALL[name](spark, SF_DIR)
    assert sdf.count() >= 0
