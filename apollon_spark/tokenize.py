"""Deterministic tokenization of the ``documents`` table into the
canonical docs shape ``(doc_id string, tokens array<int>, n_tok int,
source string)`` (BASELINE input_hint).

The token map is chosen to be expressible IDENTICALLY in Spark SQL and
ANSI/DuckDB SQL so the driver's side-by-side oracle can verify every
downstream operator:

    words  = split(text, ' ')
    token  = (length(word) * 31 + ascii(word)) % 256      -- non-negative

(ascii() = code point of the first character in both engines.)
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_EXPR = "transform(split(text, ' '), w -> cast((length(w) * 31 + ascii(w)) % 256 as int))"

# DuckDB fragment producing the same docs relation from the documents view.
DUCKDB_DOCS_CTE = """
docs AS (
  SELECT cast(doc_id AS varchar) AS doc_id,
         list_transform(string_split(text, ' '),
                        w -> cast((length(w) * 31 + ascii(w)) % 256 AS int)) AS tokens,
         cast(len(string_split(text, ' ')) AS int) AS n_tok,
         source
  FROM documents
)
"""

# DuckDB fragment for the exploded frames view on top of docs.
DUCKDB_FRAMES_CTE = """
frames AS (
  SELECT doc_id,
         CAST(generate_subscripts(tokens, 1) - 1 AS INT) AS position,
         unnest(tokens) AS token
  FROM docs
)
"""


def docs_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read ``documents.parquet`` and derive the canonical docs table."""
    documents = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        documents.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.expr(TOKEN_EXPR).alias("tokens"),
            "source",
        )
        .withColumn("n_tok", F.size("tokens").cast("int"))
        .select("doc_id", "tokens", "n_tok", "source")
    )
