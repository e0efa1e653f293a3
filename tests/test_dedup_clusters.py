"""Transitive near-dup clustering: connected components over the LSH
candidate-pair graph via fixed-round min-label propagation, with a
canonical (min doc_id) representative per cluster."""

from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

import __spark_entry__ as em


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        T.StructType([
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), False)]))


def test_known_clusters(spark, tmp_path):
    """3 copies of doc A + 2 copies of doc B + 3 distinct singletons:
    identical docs share every band bucket (clique), so components are
    exactly {0,1,2}, {3,4}, {5}, {6}, {7}."""
    texts = (["alpha beta gamma delta epsilon zeta"] * 3
             + ["one two three four five six seven"] * 2
             + ["completely different text number eight ok",
                "yet another unrelated document nine here",
                "final singleton document text ten okay"])
    _docs(spark, texts).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet")
    row = em.q_dedup_clusters(spark, str(tmp_path)).collect()[0]
    assert row.n_docs == 8
    assert row.n_clusters == 5
    assert row.n_dupes_droppable == 3
    assert row.max_cluster == 3
    # canonical reps are each cluster's min doc_id: 0, 3, 5, 6, 7
    assert row.rep_id_sum == 0 + 3 + 5 + 6 + 7


def test_chain_is_transitive(spark, tmp_path):
    """A~B and B~C but A!~C directly (overlapping shingle windows):
    one cluster of 3 — clustering must close over the pair graph, not
    just count pairs."""
    a = "w1 w2 w3 w4 w5 w6 w7 w8"
    b = "w1 w2 w3 w4 w5 w6 w7 w8 x9"   # shares most shingles with a
    texts = [a, b, a, "totally different unrelated words here now"]
    _docs(spark, texts).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet")
    row = em.q_dedup_clusters(spark, str(tmp_path)).collect()[0]
    # docs 0, 1, 2 share buckets (0 and 2 identical; 1 overlaps both)
    assert row.n_clusters == 2 and row.max_cluster == 3


def test_iteration_plan_truncated(spark, tmp_path):
    """r4 verdict #3: the propagation loop must not let the plan double
    per round — after _dedup_labels the returned frame's plan is a
    materialized localCheckpoint scan (LogicalRDD/checkpoint), NOT the
    2^ROUNDS-subtree union/join tree re-deriving the MinHash pipeline
    (no md5/shingle expressions may survive in the final plan)."""
    texts = ["alpha beta gamma delta epsilon zeta"] * 2 + [
        "totally different unrelated words here now"]
    _docs(spark, texts).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet")
    labels = em._dedup_labels(spark, str(tmp_path))
    plan = labels._jdf.queryExecution().optimizedPlan().toString()
    assert "md5" not in plan and "transform" not in plan, plan
    # cached: a second call returns the same materialized frame,
    # so the pair generator runs once per (sf_dir, rounds)
    assert em._dedup_labels(spark, str(tmp_path)) is labels


def test_rounds_converged_at_test_scale(spark, monkeypatch):
    """DEDUP_CC_ROUNDS is enough at sf0.01: one more round changes
    nothing (the fixed-round oracle mirror is exact either way, but
    the SEMANTICS should be true components at tested scales)."""
    sf = "/root/testdata/sf0.01"
    base = em.q_dedup_clusters(spark, sf).collect()[0].asDict()
    monkeypatch.setattr(em, "DEDUP_CC_ROUNDS", em.DEDUP_CC_ROUNDS + 1)
    more = em.q_dedup_clusters(spark, sf).collect()[0].asDict()
    assert base == more, (base, more)
