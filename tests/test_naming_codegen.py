"""Name mapping (reference P4) and schema->code generation (U2) —
mirrors CaseConverterTest / ColumnToFieldMapper behavior and the
CarpetRecordGeneratorTest golden-source tests (SURVEY.md §5.6)."""

import pytest
from pyspark.sql import types as T

from tokcodec.codegen import (
    generate_dataclass,
    generate_ddl,
    generate_struct_literal,
)
from tokcodec.naming import (
    FieldMatchingError,
    camel_to_snake,
    map_fields,
    snake_to_camel,
)


def test_camel_to_snake():
    assert camel_to_snake("fooBarBaz") == "foo_bar_baz"
    assert camel_to_snake("HTMLParser") == "html_parser"
    assert camel_to_snake("already_snake") == "already_snake"
    assert camel_to_snake("simple") == "simple"
    assert camel_to_snake("nTok") == "n_tok"
    assert camel_to_snake("value2X") == "value2_x"


def test_snake_to_camel():
    assert snake_to_camel("foo_bar_baz") == "fooBarBaz"
    assert snake_to_camel("n_tok") == "nTok"
    assert snake_to_camel("simple") == "simple"


def test_map_fields_precedence():
    cols = ["doc_id", "n_tok", "sourceName"]
    m = map_fields(cols, ["docId", "nTok", "alias_me"],
                   aliases={"alias_me": "sourceName"})
    assert m == {"docId": "doc_id", "nTok": "n_tok", "alias_me": "sourceName"}


def test_map_fields_exact_beats_snake():
    cols = ["nTok", "n_tok"]
    assert map_fields(cols, ["nTok"])["nTok"] == "nTok"


def test_map_fields_missing():
    with pytest.raises(FieldMatchingError):
        map_fields(["a"], ["b"])
    assert map_fields(["a"], ["b"], fail_on_missing=False)["b"] is None


def test_map_fields_bad_alias():
    with pytest.raises(FieldMatchingError):
        map_fields(["a"], ["x"], aliases={"x": "nope"})


SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
    T.StructField("meta", T.StructType([
        T.StructField("a", T.IntegerType(), True),
        T.StructField("b", T.StringType(), True),
    ]), True),
])


def test_generate_dataclass_golden():
    src = generate_dataclass(SCHEMA, "Seq")
    assert "class SeqMeta:" in src
    assert "class Seq:" in src
    assert "doc_id: str" in src
    assert "tokens: list[int]" in src
    assert "meta: SeqMeta | None" in src


def test_generate_struct_literal_roundtrips():
    src = generate_struct_literal(SCHEMA)
    rebuilt = eval(src, {"T": T})  # noqa: S307 - test-only
    assert rebuilt == SCHEMA


def test_generate_ddl():
    assert generate_ddl(SCHEMA).startswith("struct<doc_id:string")
