"""Fixture-table access (TESTDATA.md / FIXTURES.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under an sf dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Explicit parquet scan — schema comes from
    the footer; predicate pushdown + column pruning apply downstream."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
