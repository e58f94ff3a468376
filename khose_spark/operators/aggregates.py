"""Aggregation operators (SURVEY.md §2.4).

All floating aggregates are wrapped in round(, 2) — Spark's partial-agg
summation order differs from DuckDB's, so unrounded doubles would break
the order-insensitive value-hash (SURVEY.md §4.2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from khose_spark.registry import query
from khose_spark.tables import t


@query(
    "q_agg_flagship_pricing",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      round(sum(l_quantity), 2)                                        AS sum_qty,
      round(sum(l_extendedprice), 2)                                   AS sum_base_price,
      round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
      round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
      round(avg(l_quantity), 2)                                        AS avg_qty,
      round(avg(l_extendedprice), 2)                                   AS avg_price,
      round(avg(l_discount), 2)                                        AS avg_disc,
      count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_flagship_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (= entry()): TPC-H Q1-shaped pricing summary over lineitem.

    Spark plan: parquet scan (predicate on l_shipdate pushed to the
    row-group level, only 7 columns read) -> partial hash-aggregate on
    each partition -> single shuffle on the 6-value group key -> final
    hash-aggregate. At 100 TB this stays a one-shuffle map-side-combine
    plan; the group-key cardinality (|returnflag|x|linestatus| = 6) makes
    the final stage trivially small.
    """
    li = t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
