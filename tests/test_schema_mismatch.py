"""Schema-evolution / mismatch tests (reference SURVEY.md §5.4:
projection, missing columns, narrowing flags — SchemaFilterTest and
CarpetReaderTest mismatch cases re-expressed for the engine)."""

import pytest
from pyspark.sql import functions as F, types as T

from tokcodec.io_tables import read_encoded_as, write_encoded
from tokcodec.naming import FieldMatchingError
from tokcodec.synth import synth_df


@pytest.fixture(scope="module")
def enc_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mismatch") / "enc")
    df = synth_df(spark, 2000, seed=7, partitions=4)
    write_encoded(df, path, n_buckets=4, run_id="r1")
    return path


def test_snake_case_matching(spark, enc_path):
    # camelCase request resolves to snake_case file columns (P4)
    rs = T.StructType([
        T.StructField("docId", T.StringType(), False),
        T.StructField("nTok", T.IntegerType(), False),
    ])
    out = read_encoded_as(spark, enc_path, rs)
    assert out.columns == ["docId", "nTok"]
    assert out.count() == 2000


def test_alias_mapping(spark, enc_path):
    rs = T.StructType([T.StructField("origin", T.StringType(), False)])
    out = read_encoded_as(spark, enc_path, rs, aliases={"origin": "source"})
    vals = {r.origin for r in out.distinct().collect()}
    assert vals <= {"web", "books", "code", "wiki", "chat"}


def test_missing_column_fails_by_default(spark, enc_path):
    rs = T.StructType([T.StructField("nope", T.IntegerType(), True)])
    with pytest.raises(FieldMatchingError):
        read_encoded_as(spark, enc_path, rs)


def test_missing_column_defaults_when_allowed(spark, enc_path):
    rs = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("extra_null", T.IntegerType(), True),
        T.StructField("extra_prim", T.IntegerType(), False),
    ])
    out = read_encoded_as(spark, enc_path, rs, fail_on_missing_column=False)
    row = out.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("extra_null").isNull(), 1).otherwise(0)).alias("nulls"),
        F.sum("extra_prim").alias("zeros"),
    ).collect()[0]
    # nullable missing -> null; primitive missing -> default 0
    # (reference ReadReflection.java:72-95 policy)
    assert row.n == 2000 and row.nulls == 2000 and row.zeros == 0


def test_missing_default_next_to_list_column(spark, enc_path):
    # row count must come from the list column's lengths component,
    # not its flattened element count
    rs = T.StructType([
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("missing", T.LongType(), True),
    ])
    out = read_encoded_as(spark, enc_path, rs, fail_on_missing_column=False)
    row = out.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("missing").isNull(), 1).otherwise(0)).alias("nulls"),
    ).collect()[0]
    assert row.n == 2000 and row.nulls == 2000


def test_widening_int_to_long(spark, enc_path):
    rs = T.StructType([T.StructField("n_tok", T.LongType(), False)])
    out = read_encoded_as(spark, enc_path, rs)
    assert out.schema["n_tok"].dataType == T.LongType()
    assert out.agg(F.sum("n_tok")).collect()[0][0] > 0


def test_narrowing_truncates_by_default(spark, enc_path):
    # n_tok (int32, small values) narrowed to short: values fit, works
    rs = T.StructType([T.StructField("n_tok", T.ShortType(), False)])
    out = read_encoded_as(spark, enc_path, rs)
    assert out.count() == 2000


def test_narrowing_overflow_raises_with_flag(spark, tmp_path):
    df = spark.createDataFrame(
        [(str(i), 100000 + i) for i in range(100)], "id string, big int"
    )
    path = str(tmp_path / "enc")
    write_encoded(df, path, n_buckets=2, run_id="r1")
    rs = T.StructType([T.StructField("big", T.ShortType(), False)])
    with pytest.raises(Exception):
        read_encoded_as(spark, path, rs, fail_on_narrowing=True).collect()
    # and the default truncating read completes
    assert read_encoded_as(spark, path, rs).count() == 100