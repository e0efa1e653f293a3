"""Compressed size <= reference Parquet (snappy) on identical data —
the BASELINE.json size criterion. Reference codec default is SNAPPY
(reference CarpetWriter.java:161)."""

import pytest

from tokcodec import encoded_size_bytes, parquet_size_bytes, write_encoded
from tokcodec.synth import synth_df


@pytest.mark.parametrize("n_rows", [20_000])
def test_encoded_smaller_than_parquet_snappy(spark, tmp_path, n_rows):
    df = synth_df(spark, n_rows, seed=42, partitions=8).cache()
    ref = str(tmp_path / "ref_parquet")
    df.write.mode("overwrite").option("compression", "snappy").parquet(ref)
    enc = str(tmp_path / "enc")
    summary = write_encoded(df, enc, n_buckets=8, run_id="r1")
    ours = encoded_size_bytes(enc)
    theirs = parquet_size_bytes(ref)
    assert ours <= theirs, f"encoded {ours} > parquet-snappy {theirs}"
    # and the engine's own ratio accounting is sane
    assert 0 < summary["ratio"] < 1
