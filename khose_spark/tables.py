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

    Timestamp normalization (fixtures have shipped in two layouts):
    - TIMESTAMP(NANOS): Spark reads a nanosecond long (with
      legacy.parquet.nanosAsLong) — convert via exact integer division,
      the same microsecond truncation DuckDB applies.
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
      TIMESTAMP_NTZ — cast to TimestampType. The session is pinned to
      UTC (session.py), so the cast is value-identical; it matters
      because several sinks/functions treat NTZ differently (e.g. the
      CSV/JSON writers format NTZ with timestampNTZFormat, not
      timestampFormat)."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    for field in df.schema.fields:
        if isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df
