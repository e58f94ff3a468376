"""Fixture-table access (TESTDATA.md / FIXTURES.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under an sf dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    the footer; predicate pushdown + column pruning apply downstream.

    events.ts is stored as parquet TIMESTAMP(NANOS); Spark reads it as a
    nanosecond long (legacy.parquet.nanosAsLong) and we convert to
    TimestampType via exact integer division — same microsecond
    truncation DuckDB applies, so oracle hashes line up."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
