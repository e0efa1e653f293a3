"""Block checksum verification (reference page-checksum knob,
CarpetWriter.java:392-406) and bucket-sizing helper."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from tokcodec import read_encoded, write_encoded
from tokcodec.io_tables import suggest_buckets
from tokcodec.synth import synth_df


def test_suggest_buckets():
    assert suggest_buckets(100 * (1 << 40)) == 409600  # 100TB -> ~400k
    assert suggest_buckets(1) == 1


def test_checksum_verification_clean(spark, tmp_path):
    df = synth_df(spark, 2000, seed=3, partitions=4)
    path = str(tmp_path / "enc")
    write_encoded(df, path, n_buckets=4, run_id="r1")
    dec = read_encoded(spark, path, verify_checksums=True)
    assert dec.count() == 2000


def test_checksum_detects_corruption(spark, tmp_path):
    df = synth_df(spark, 2000, seed=3, partitions=4)
    path = str(tmp_path / "enc")
    write_encoded(df, path, n_buckets=4, run_id="r1")
    # flip bytes in the middle of the largest tokens block file
    files = sorted(
        glob.glob(os.path.join(path, "blocks", "col-tokens", "*.parquet")),
        key=os.path.getsize,
    )
    target = files[-1]
    size = os.path.getsize(target)
    with open(target, "r+b") as f:
        f.seek(size // 2)
        f.write(bytes([0xAA] * 64))
    # parquet itself may or may not notice (pages aren't checksummed by
    # default); our block checksum must
    with pytest.raises(Exception, match="checksum mismatch|Corruption|PARQUET|parquet"):
        read_encoded(spark, path, verify_checksums=True).collect()