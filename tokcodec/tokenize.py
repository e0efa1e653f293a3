"""Portable deterministic tokenizer: documents -> sequences.

Turns the driver's ``documents`` table (doc_id, text, lang, source,
n_chars) into the canonical sequences shape. The token function is
expressible identically in Spark SQL and DuckDB SQL so the driver's
oracle can recompute token aggregates independently:

    token(w) = (length(w)*31 + ascii(first_char(w))) % 50257
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

VOCAB = 50257

# Spark-side expression (whole-column, JVM-evaluated — no Python)
TOKENS_EXPR = (
    "transform(split(text, ' '), "
    f"w -> cast((length(w)*31 + coalesce(ascii(substring(w, 1, 1)), 0)) % {VOCAB} as int))"
)

# DuckDB equivalent over the same text column
TOKENS_SQL_DUCKDB = (
    "list_transform(str_split(text, ' '), "
    "w -> CAST((length(w)*31 + CASE WHEN length(w) > 0 THEN ord(w[1]) ELSE 0 END) "
    f"% {VOCAB} AS INTEGER))"
)


def documents_to_sequences(docs: DataFrame) -> DataFrame:
    """documents table -> (doc_id string, tokens array<int>, n_tok int, source)."""
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.expr(TOKENS_EXPR).alias("tokens"),
        F.expr(f"cast(size({TOKENS_EXPR}) as int)").alias("n_tok"),
        F.col("source"),
    )
