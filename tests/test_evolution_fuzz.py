"""Seeded fuzz over schema-evolution append sequences: random base
schema, 2-4 appends each adding random nullable columns (and randomly
omitting previously-added nullable ones); a driver-side model tracks
the expected union rows (None for every value a run's schema didn't
carry). Full read, late-column projection, and the direct reader must
all agree with the model."""

import os
import random

from pyspark.sql import types as T

from tests.test_fuzz_roundtrip import LEAVES, _canon, rand_value
from tokcodec.io_tables import (
    read_encoded,
    read_encoded_direct,
    write_encoded,
)


def test_fuzzed_evolution_sequences(spark, tmp_path):
    for seed in range(6):
        rng = random.Random(7000 + seed)
        base_cols = [
            T.StructField(f"b{i}", rng.choice(LEAVES), rng.random() < 0.5)
            for i in range(rng.randint(1, 2))
        ]
        union_fields = [T.StructField("doc_id", T.StringType(), False)] \
            + list(base_cols)
        added: list[T.StructField] = []
        model: dict[str, dict] = {}
        path = os.path.join(str(tmp_path), f"evo{seed}")
        doc = 0
        n_appends = rng.randint(2, 4)
        for ep in range(n_appends):
            if ep > 0 and rng.random() < 0.8:
                n_new = rng.randint(1, 2)
                for _ in range(n_new):
                    f = T.StructField(f"a{len(added)}", rng.choice(LEAVES),
                                      True)
                    added.append(f)
            # this run's schema: doc_id + base + a random subset of the
            # added-so-far columns (omission only legal for nullable,
            # which added columns always are)
            present_added = [f for f in added if rng.random() < 0.8]
            # the TABLE's union only ever contains columns some run
            # actually wrote, in first-written order
            known = {f.name for f in union_fields}
            union_fields += [f for f in present_added
                             if f.name not in known]
            run_schema = T.StructType(
                [T.StructField("doc_id", T.StringType(), False)]
                + base_cols + present_added
            )
            n_rows = rng.randint(1, 25)
            rows = []
            for _ in range(n_rows):
                rid = f"d{doc:05d}"
                doc += 1
                vals = {"doc_id": rid}
                for f in run_schema.fields[1:]:
                    vals[f.name] = rand_value(rng, f.dataType, f.nullable)
                rows.append(tuple(vals[f.name] for f in run_schema.fields))
                model[rid] = vals
            df = spark.createDataFrame(rows, run_schema)
            write_encoded(df, path, n_buckets=2, run_id=f"r{ep}",
                          epoch=ep, resume=ep > 0,
                          schema_evolution=True, chunk_max_rows=7)

        union = T.StructType(union_fields)
        want = {
            rid: _canon(tuple(vals.get(f.name) for f in union.fields))
            for rid, vals in model.items()
        }
        for reader in (read_encoded, read_encoded_direct):
            out = reader(spark, path)
            assert [f.name for f in out.schema.fields] == \
                [f.name for f in union.fields], (seed, reader.__name__)
            got = {
                r["doc_id"]: _canon(tuple(
                    r.asDict(recursive=True)[f.name] for f in union.fields))
                for r in out.collect()
            }
            assert set(got) == set(want), (seed, reader.__name__)
            for k in want:
                assert got[k] == want[k], (
                    seed, reader.__name__, k, got[k], want[k],
                )
        if added:
            last = added[-1].name
            proj = {
                r["doc_id"]: _canon(r.asDict(recursive=True)[last])
                for r in read_encoded(
                    spark, path, columns=["doc_id", last]).collect()
            }
            for rid, vals in model.items():
                assert proj[rid] == _canon(vals.get(last)), (seed, rid)
