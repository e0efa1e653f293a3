"""Metadata-only observability: count_encoded / describe_encoded read
lineage + manifest, never a block payload (the COUNT(*) fast path)."""

from pyspark.sql import functions as F

from tokcodec import write_encoded
from tokcodec.io_tables import compact_encoded, count_encoded, describe_encoded
from tokcodec.synth import synth_df


def test_count_and_describe(spark, tmp_path):
    path = str(tmp_path / "enc")
    df = synth_df(spark, 3_000, seed=5, partitions=4)
    write_encoded(df, path, n_buckets=4, run_id="r0", epoch=0)
    more = synth_df(spark, 1_000, seed=6, partitions=2)
    write_encoded(more, path, n_buckets=4, run_id="r1", epoch=1, resume=True)

    assert count_encoded(spark, path) == 4_000
    assert count_encoded(spark, path, as_of_epoch=0) == 3_000

    d = describe_encoded(spark, path)
    assert d["rows"] == 4_000
    assert d["n_buckets"] == 4
    assert d["epochs"] == [0, 1]
    assert 0 < d["ratio"] < 1
    assert set(d["codecs"]) >= {"tokens", "doc_id", "n_tok", "source"}
    # tokens is the bulk payload; its codec histogram must be non-empty
    assert sum(d["codecs"]["tokens"].values()) > 0

    # counts follow compaction (single run supersedes both epochs)
    compact_encoded(spark, path, run_id="c")
    assert count_encoded(spark, path) == 4_000
    d2 = describe_encoded(spark, path)
    assert d2["rows"] == 4_000
    assert len(d2["epochs"]) == 1
