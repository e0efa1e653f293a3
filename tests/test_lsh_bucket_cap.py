"""LSH bucket cap (round-3 verdict #3): an all-duplicates corpus must
not generate quadratic pairs — both pair generators keep at most
LSH_BUCKET_CAP members per (band, bucket), deterministically (first
CAP in sort order), so worst-case pairs = CAP^2/2 per bucket."""

from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

import __spark_entry__ as entrymod


def test_cap_bounds_pathological_bucket(spark, tmp_path, monkeypatch):
    """300 identical documents all land in the same LSH buckets; with
    the cap monkeypatched to 20 the candidate-pair count is bounded by
    C(20,2) per band-bucket (here all 4 bands collapse to the same
    member set -> exactly C(20,2) distinct pairs), not C(300,2)."""
    monkeypatch.setattr(entrymod, "LSH_BUCKET_CAP", 20)
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="the same exact duplicated sentence appears")
         for i in range(300)],
        T.StructType([
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), False),
        ]))
    sf_dir = str(tmp_path)
    docs.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    out = entrymod.q_minhash_neardup_pairs(spark, sf_dir).collect()[0]
    assert out.n_candidate_pairs == 20 * 19 // 2
    # the capped membership is the FIRST 20 doc_ids in sort order
    assert out.nd1 == 19 and out.nd2 == 19


def test_cap_deterministic_members(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(entrymod, "LSH_BUCKET_CAP", 5)
    vecs = spark.createDataFrame(
        [Row(vec_id=i, label="a", embedding=[1.0] * 64) for i in range(50)],
        T.StructType([
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("label", T.StringType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        ]))
    sf_dir = str(tmp_path)
    vecs.write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")
    pairs = entrymod.q_emb_neardup_lsh(spark, sf_dir)
    rows = {(r.v1, r.v2) for r in pairs.collect()}
    # identical vectors share every band bucket; cap keeps vec_ids 1..5
    # (vec_id 0 excluded? no — q_emb_neardup_lsh keeps all ids here)
    expected = {(a, b) for a in range(5) for b in range(5) if a < b}
    assert rows == expected
