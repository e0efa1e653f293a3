"""Foreign-file interop: legacy parquet list annotations.

The reference's compatibility corpus
(CarpetReaderCompatibilityTest.java:344-449) proves it reads parquet
files whose lists were written with the legacy ONE/TWO-level
annotations (AnnotatedLevels, JavaRecord2Schema.java:135-179) by other
writers. Our engine's own block format is always the 3-level analogue,
but the INGEST path must accept foreign files regardless of their list
annotation: here pyarrow writes the legacy 2-level shape
(``use_compliant_nested_type=False`` — element field named ``item``,
non-compliant LIST annotation, the parquet-mr 1.x layout) plus the
modern compliant shape, Spark reads both, and the engine encodes,
decodes, and round-trips them bit-identically.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from tokcodec.io_tables import read_encoded, write_encoded


def _corpus():
    return pa.table(
        {
            "doc_id": pa.array(["0", "1", "2", "3"]),
            "tokens": pa.array(
                [[1, 2, 3], [], [7], [2147483647, -2147483648]],
                type=pa.list_(pa.int32()),
            ),
            "nested": pa.array(
                [[[1], [2, 3]], [], [[4]], [[], [5]]],
                type=pa.list_(pa.list_(pa.int64())),
            ),
        }
    )


def _roundtrip(spark, src_file, table_dir):
    df = spark.read.parquet(src_file)
    write_encoded(df, table_dir, n_buckets=2, run_id="legacy")
    dec = read_encoded(spark, table_dir)
    rows = sorted(
        (r.doc_id, tuple(r.tokens), tuple(map(tuple, r.nested)))
        for r in dec.collect()
    )
    assert rows == [
        ("0", (1, 2, 3), ((1,), (2, 3))),
        ("1", (), ()),
        ("2", (7,), ((4,),)),
        ("3", (2147483647, -2147483648), ((), (5,))),
    ]


def test_legacy_two_level_lists_ingest(spark, tmp_path):
    src = str(tmp_path / "legacy.parquet")
    pq.write_table(_corpus(), src, use_compliant_nested_type=False)
    _roundtrip(spark, src, str(tmp_path / "tbl_legacy"))


def test_compliant_three_level_lists_ingest(spark, tmp_path):
    src = str(tmp_path / "compliant.parquet")
    pq.write_table(_corpus(), src, use_compliant_nested_type=True)
    _roundtrip(spark, src, str(tmp_path / "tbl_compliant"))


def test_legacy_and_compliant_files_hash_identically(spark, tmp_path):
    """The same logical data through either annotation must produce the
    same decoded values — the reader's behavior cannot depend on the
    writer's list flavor."""
    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    pq.write_table(_corpus(), a, use_compliant_nested_type=False)
    pq.write_table(_corpus(), b, use_compliant_nested_type=True)
    da = spark.read.parquet(a)
    db = spark.read.parquet(b)
    assert da.schema == db.schema
    assert da.exceptAll(db).count() == 0
    assert db.exceptAll(da).count() == 0
    meta_a = pq.ParquetFile(a).schema_arrow
    meta_b = pq.ParquetFile(b).schema_arrow
    # sanity: the two files really differ at the parquet level
    assert str(pq.ParquetFile(a).schema) != str(pq.ParquetFile(b).schema)
    assert meta_a.field("tokens").type == meta_b.field("tokens").type
