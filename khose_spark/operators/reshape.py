"""Reshaping operators: pivot, unpivot (melt), histogram profiling, and
time-series gap-fill over a generated date spine (SURVEY.md §2 widening,
round 1 spare capacity).

Scale notes baked into each plan:
- ``pivot`` is given its value list explicitly — otherwise Spark runs an
  extra distinct-collect job over the full table just to learn the
  column set, which at 100 TB is a full scan spent on metadata.
- ``unpivot`` is a zero-shuffle Expand on already-aggregated (tiny)
  input; the shuffles happen before the melt, on dense integer keys.
- the gap-fill spine is built with ``explode(sequence(...))`` — a
  per-row generator, NOT a crossJoin — so no cartesian appears in the
  physical plan and the spine inherits the users' partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from khose_spark.registry import query
from khose_spark.sqlutil import dec_sum, sql_dec_sum
from khose_spark.tables import t

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

_pivot_cols = ",\n      ".join(
    sql_dec_sum(f"CASE WHEN o_orderpriority = '{p}' THEN o_totalprice END", 2)
    + f' AS "{p}"'
    for p in _PRIORITIES
)


@query(
    "q_reshape_pivot",
    oracle=f"""
    SELECT c_mktsegment,
      {_pivot_cols}
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_reshape_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order value by market segment × priority as a wide pivot table.
    The priority list is pinned (no distinct-discovery job); customer is
    broadcast into orders; one aggregation shuffle on the 5 segments.
    Money sums go through the decimal-cast law so the per-cell totals
    are order-insensitive."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(dec_sum(F.col("o_totalprice"), 2))
    )


@query(
    "q_reshape_unpivot",
    oracle="""
    SELECT n_nationkey, 'n_cust' AS metric, CAST(count(c_custkey) AS BIGINT) AS cnt
    FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_nationkey
    UNION ALL
    SELECT n_nationkey, 'n_supp' AS metric, CAST(count(s_suppkey) AS BIGINT) AS cnt
    FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
)
def q_reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-nation metrics (customer count, supplier count) melted to
    long (nationkey, metric, cnt) via DataFrame.unpivot. The counts
    aggregate on dense integer keys first (2 small shuffles), then the
    melt itself is a no-shuffle Expand over 25 rows. Nations with no
    customers/suppliers keep a 0 row (left joins off the nation spine)."""
    nation = t(spark, sf_dir, "nation").select("n_nationkey")
    cust = (
        t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_cust"))
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_supp"))
    )
    wide = (
        nation.join(F.broadcast(cust), nation.n_nationkey == cust.c_nationkey, "left")
        .join(F.broadcast(supp), nation.n_nationkey == supp.s_nationkey, "left")
        .select(
            "n_nationkey",
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )
    return wide.unpivot(["n_nationkey"], ["n_cust", "n_supp"], "metric", "cnt")


@query(
    "q_reshape_histogram",
    oracle="""
    SELECT bucket, bucket * 25000 AS bucket_lo, n,
           CAST(sum(n) OVER (ORDER BY bucket) AS BIGINT) AS cum_n
    FROM (
      SELECT CAST(floor(o_totalprice / 25000) AS INT) AS bucket,
             count(*) AS n
      FROM orders GROUP BY 1
    )
    """,
)
def q_reshape_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-distribution profile of o_totalprice: fixed-width 25k
    buckets with counts and a cumulative count (running sum over the
    ~40 bucket rows — the window runs on post-aggregation data, so the
    single-partition global window is fine at any input scale)."""
    orders = t(spark, sf_dir, "orders")
    agg = (
        orders.groupBy(
            F.floor(F.col("o_totalprice") / 25000).cast("int").alias("bucket")
        )
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return agg.select(
        "bucket",
        (F.col("bucket").cast("long") * 25000).alias("bucket_lo"),
        "n",
        F.sum("n").over(w).alias("cum_n"),
    )


@query(
    "q_ts_gapfill",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, strftime(ts, '%Y-%m-%d') AS d,
             {sql_dec_sum('value', 4)} AS spend
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ), users AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ), spine AS (
      SELECT user_id, strftime(gs, '%Y-%m-%d') AS d
      FROM users CROSS JOIN (
        SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                      INTERVAL 1 DAY)) AS gs)
    )
    SELECT s.user_id, s.d, coalesce(daily.spend, 0.0) AS spend,
           CAST(daily.spend IS NOT NULL AS INT) AS active
    FROM spine s LEFT JOIN daily ON s.user_id = daily.user_id AND s.d = daily.d
    """,
)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily spend series: every (purchasing user, day of
    Jan 2024) cell, 0-filled where the user was inactive — the dense
    calendar spine a hypertable/continuous-aggregate layer emits.

    The spine is explode(sequence(...)) per user (a generator, no
    cartesian join); the fill is a left join on the dense (user_id, day)
    key. Day is emitted as a string: Spark DATE arrives in pandas as
    datetime.date while DuckDB DATE arrives as Timestamp, and the
    driver's canonical form distinguishes them."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = (
        ev.groupBy("user_id", F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .agg(dec_sum(F.col("value"), 4).alias("spend"))
    )
    spine = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.expr("sequence(to_date('2024-01-01'), to_date('2024-01-30'))")
            ).alias("dd"),
        )
        .select("user_id", F.date_format("dd", "yyyy-MM-dd").alias("d"))
    )
    return spine.join(daily, ["user_id", "d"], "left").select(
        "user_id",
        "d",
        F.coalesce("spend", F.lit(0.0)).alias("spend"),
        F.col("spend").isNotNull().cast("int").alias("active"),
    )
