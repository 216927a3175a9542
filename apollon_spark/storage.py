"""Storage layer: Iceberg when the runtime has the catalog/jars,
identical-schema Parquet otherwise (SURVEY §7.0).

The engine is storage-agnostic: every reader/writer goes through this
module, so pointing ``APOLLON_SPARK_CATALOG`` at an Iceberg catalog
upgrades all IO without code changes. Parquet fallback keeps the same
layout (one table per directory, partition columns preserved) plus the
pipeline's manifest markers for resume.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

CATALOG_ENV = "APOLLON_SPARK_CATALOG"


def iceberg_available(spark: SparkSession) -> bool:
    cat = os.environ.get(CATALOG_ENV)
    if not cat:
        return False
    try:
        spark.sql(f"SHOW NAMESPACES IN {cat}")
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, location: str) -> DataFrame:
    """``location`` is either ``catalog.db.table`` (Iceberg) or a
    filesystem path (Parquet)."""
    if os.sep in location or location.endswith(".parquet"):
        return spark.read.parquet(location)
    return spark.table(location)


def write_table(df: DataFrame, location: str, mode: str = "overwrite",
                partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if os.sep in location or location.endswith(".parquet"):
        writer.parquet(location)
    else:
        writer.format("iceberg").saveAsTable(location)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Debug sink (reference FeatureSpace.to_csv, container.py:115-160).
    Array columns are JSON-encoded so the row-pivot shape survives."""
    from pyspark.sql import functions as F
    out = df
    for name, dtype in df.dtypes:
        if dtype.startswith("array") or dtype.startswith("struct"):
            out = out.withColumn(name, F.to_json(name))
    out.write.mode(mode).option("header", True).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ndarray-aware JSON sink (io/json.py:53-66): Spark renders array
    columns as JSON arrays natively."""
    df.write.mode(mode).json(path)


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int, sort_cols: list[str] | None = None,
                   path: str | None = None,
                   mode: str = "overwrite") -> None:
    """Write a bucketed (and optionally sorted) table — the layout
    SCALE.md §1 recommends for the docs table: bucket by the join/
    resume key (e.g. doc_id) so joins against model tables bucketed
    the same way are CO-LOCATED (no exchange on either side — verified
    by tests/test_plans.py::test_bucketed_join_is_colocated), and sort
    by n_tok within files so whales cluster into few row groups.

    Bucketing requires the table catalog (``saveAsTable``); ``path``
    makes it an external table at that filesystem location. On a real
    deployment the Iceberg catalog's bucket partition transform plays
    this role; the mechanism below is the built-in Spark one and works
    everywhere."""
    writer = df.write.mode(mode).format("parquet") \
        .bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
