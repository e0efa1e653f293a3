"""Randomized-SCHEMA roundtrip fuzz: random field types (flat, list,
struct, map, nested list), random null patterns, random write
geometry (buckets, chunk caps, clustering, blooms, encryption) —
every generated table must round-trip bit-identical through
write_encoded -> read_encoded. Seeded, so a failure replays exactly.
This is the reference's record-roundtrip test strategy (SURVEY §5)
turned up to schema space."""

from __future__ import annotations

import datetime as dt
import random
import shutil
from decimal import Decimal

import pytest
from pyspark.sql import functions as F, types as T

from tokcodec import verify_roundtrip
from tokcodec.io_tables import read_encoded, write_encoded

_SCALARS = [
    ("int", T.IntegerType(), lambda r: r.randrange(-2**31, 2**31)),
    ("big", T.LongType(), lambda r: r.randrange(-2**62, 2**62)),
    ("small", T.ShortType(), lambda r: r.randrange(-2**15, 2**15)),
    ("bool", T.BooleanType(), lambda r: r.random() < 0.5),
    ("dbl", T.DoubleType(), lambda r: r.uniform(-1e6, 1e6)),
    ("flt", T.FloatType(), lambda r: float(r.randrange(-1000, 1000))),
    ("s", T.StringType(),
     lambda r: "".join(r.choices("abcdef ghij", k=r.randrange(0, 30)))),
    ("bin", T.BinaryType(),
     lambda r: bytes(r.getrandbits(8) for _ in range(r.randrange(0, 12)))),
    ("dec", T.DecimalType(12, 2),
     lambda r: Decimal(r.randrange(-10**9, 10**9)).scaleb(-2)),
    ("bigdec", T.DecimalType(30, 4),
     lambda r: Decimal(r.randrange(-10**20, 10**20)).scaleb(-4)),
    ("day", T.DateType(),
     lambda r: dt.date(2020, 1, 1) + dt.timedelta(days=r.randrange(0, 2000))),
    ("ts", T.TimestampType(),
     lambda r: dt.datetime(2021, 1, 1, tzinfo=dt.timezone.utc)
     + dt.timedelta(seconds=r.randrange(0, 10**8),
                    microseconds=r.randrange(0, 10**6))),
]


def _gen_field(r: random.Random, i: int):
    """One random field: scalar, array<scalar>, struct, map, or
    array<array<int>>."""
    name, t, gen = r.choice(_SCALARS)
    shape = r.randrange(0, 10)
    fname = f"{name}_{i}"
    if shape < 5:  # scalar
        return T.StructField(fname, t, True), gen
    if shape < 7:  # flat array (with element nulls)
        def agen(rr, g=gen):
            if rr.random() < 0.05:
                return None
            return [None if rr.random() < 0.1 else g(rr)
                    for _ in range(rr.randrange(0, 6))]
        return T.StructField(fname, T.ArrayType(t, True), True), agen
    if shape < 8:  # struct of two scalars
        _, t2, gen2 = r.choice(_SCALARS)
        def sgen(rr, g=gen, g2=gen2):
            if rr.random() < 0.05:
                return None
            return (None if rr.random() < 0.1 else g(rr),
                    None if rr.random() < 0.1 else g2(rr))
        st = T.StructType([T.StructField("a", t, True),
                           T.StructField("b", t2, True)])
        return T.StructField(fname, st, True), sgen
    if shape < 9:  # map<string, scalar>
        def mgen(rr, g=gen):
            if rr.random() < 0.05:
                return None
            return {f"k{j}": (None if rr.random() < 0.1 else g(rr))
                    for j in range(rr.randrange(0, 4))}
        return T.StructField(fname, T.MapType(T.StringType(), t, True),
                             True), mgen
    # nested list<list<int>>
    def ngen(rr):
        if rr.random() < 0.05:
            return None
        return [None if rr.random() < 0.1 else
                [rr.randrange(0, 100) for _ in range(rr.randrange(0, 4))]
                for _ in range(rr.randrange(0, 4))]
    return T.StructField(
        fname, T.ArrayType(T.ArrayType(T.IntegerType(), True), True),
        True), ngen


@pytest.mark.parametrize("seed", [101, 202, 303, 404, 505, 606, 707, 808])
def test_random_schema_roundtrip(spark, tmp_path, seed):
    r = random.Random(seed)
    n_fields = r.randrange(2, 6)
    fields, gens = [], []
    for i in range(n_fields):
        f, g = _gen_field(r, i)
        fields.append(f)
        gens.append(g)
    # a guaranteed non-null key for verify_roundtrip's join
    schema = T.StructType(
        [T.StructField("k", T.LongType(), False)] + fields)
    n = r.randrange(50, 400)
    rows = []
    for i in range(n):
        row = [i]
        for f, g in zip(fields, gens):
            v = None if r.random() < 0.08 else g(r)
            row.append(v)
        rows.append(tuple(row))
    df = spark.createDataFrame(rows, schema)

    kw = dict(n_buckets=r.choice([1, 2, 4]),
              chunk_max_rows=r.choice([16, 64, 256]))
    intish = [f.name for f in fields
              if isinstance(f.dataType,
                            (T.IntegerType, T.LongType, T.ShortType))]
    if intish and r.random() < 0.5:
        kw["cluster_by"] = r.choice(intish)
    strs = [f.name for f in fields
            if isinstance(f.dataType, T.StringType)]
    if strs and r.random() < 0.5:
        kw["bloom_columns"] = [r.choice(strs)]
    if r.random() < 0.3:
        kw["encryption_key"] = bytes(range(32))
        kw["encrypted_columns"] = [r.choice([f.name for f in fields])]

    base = str(tmp_path / f"fz{seed}")
    write_encoded(df.repartition(1), base, **kw)
    dec = read_encoded(spark, base,
                       encryption_key=kw.get("encryption_key"))
    res = verify_roundtrip(df, dec, key="k")
    assert res["ok"], (seed, kw, res)
    shutil.rmtree(base, ignore_errors=True)
