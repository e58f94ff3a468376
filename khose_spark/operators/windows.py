"""Window-function operators (SURVEY.md §2.5).

Every ordering is made total with a unique tiebreaker column so ranks
and frame contents are deterministic across engines. Floating window
sums are plain-rounded only where values are continuous; running sums
of money use the decimal path (sqlutil law).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from khose_spark.registry import query
from khose_spark.sqlutil import dec_sum, sql_dec_sum
from khose_spark.tables import t


@query(
    "q_win_ranking",
    oracle="""
    SELECT c_custkey, c_nationkey,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def q_win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family over customers by acctbal within nation."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "q_win_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           round(lag(value)  OVER w, 2) AS prev_value,
           round(lead(value) OVER w, 2) AS next_value,
           round(value - lag(value) OVER w, 2) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation per user timeline. value has 2 decimals and
    lag/delta are single subtractions of 2-decimal values — exact in
    double, so plain round matches."""
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.lag("value").over(w), 2).alias("prev_value"),
        F.round(F.lead("value").over(w), 2).alias("next_value"),
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
    )


@query(
    "q_win_running_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(28,2)))
                OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value
    FROM events
    """,
)
def q_win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (prefix) sum per user — decimal accumulator so every
    prefix is exact (a float prefix-sum would drift between engines)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(28,2)")).over(w).cast("double").alias("running_value"),
    )


@query(
    "q_win_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           round(CAST(sum(CAST(value AS DECIMAL(28,2))) OVER w AS DOUBLE)
                 / count(*) OVER w, 4) AS mavg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
    """,
)
def q_win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row centered moving average. Computed as exact-decimal frame sum
    cast to double, divided by the frame count — identical IEEE division
    on both engines (decimal avg itself differs: Spark truncates the
    quotient at scale+4, DuckDB computes in double)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-1, 1)
    )
    frame_sum = F.sum(F.col("value").cast("decimal(28,2)")).over(w).cast("double")
    frame_cnt = F.count(F.lit(1)).over(w)
    return t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(frame_sum / frame_cnt, 4).alias("mavg"),
    )


@query(
    "q_win_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(28,2)))
                OVER (PARTITION BY user_id
                      ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS hour_value
    FROM events
    """,
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over epoch seconds: same-user value sum within the
    preceding 3600s. Spark unix_timestamp floors to seconds — the oracle
    mirrors with floor(epoch()). Equal-second peers are frame peers in
    both engines; the decimal accumulator makes peer order irrelevant."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(28,2)")).over(w).cast("double").alias("hour_value"),
    )


@query(
    "q_win_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type)  OVER w AS last_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last event_type per user by time, over a full frame with a
    (ts, event_id) total order; one row per user via distinct."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w).alias("last_type"),
        )
        .distinct()
    )


@query(
    "q_win_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q_win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per group via row_number + filter. At 100 TB, AQE plans the
    rank window after a single hash partition on the group key; for
    extreme skew, pre-aggregate a per-partition top-k first."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_win_ratio_total",
    oracle=f"""
    WITH rev AS (
      SELECT n_name, n_regionkey,
             {sql_dec_sum('o_totalprice', 2)} AS revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_name, n_regionkey
    )
    SELECT n_name,
           revenue,
           round(revenue / sum(revenue) OVER (PARTITION BY n_regionkey), 6)
             AS region_share
    FROM rev
    """,
)
def q_win_ratio_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of its region's order
    revenue. The window runs over the 25-row post-aggregation frame, so
    the partition-total sum is trivially cheap at any input scale; the
    share is a continuous quotient of decimal-exact sums, so round(6)
    is hash-stable on both engines."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    rev = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "n_regionkey")
        .agg(dec_sum(F.col("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("n_regionkey")
    return rev.select(
        "n_name",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(w), 6).alias(
            "region_share"
        ),
    )


@query(
    "q_win_nth_value",
    oracle="""
    SELECT o_orderpriority,
           round(first_p, 2) AS top1_price,
           round(second_p, 2) AS top2_price,
           round(third_p, 2) AS top3_price
    FROM (
      SELECT o_orderpriority,
             first_value(o_totalprice) OVER w AS first_p,
             nth_value(o_totalprice, 2) OVER w AS second_p,
             nth_value(o_totalprice, 3) OVER w AS third_p,
             row_number() OVER w AS rk
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING)
    ) WHERE rk = 1
    """,
)
def q_win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value window surface: the 1st/2nd/3rd highest order price
    per priority from ONE full-frame window pass (first_value +
    nth_value(2,3) + row_number share a single sort), collapsed to one
    row per priority — the "podium" idiom that would otherwise take a
    self-join or three. Deterministic ordering via the orderkey
    tiebreak; 5 output rows at any scale."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        o.select(
            "o_orderpriority",
            F.first("o_totalprice").over(w).alias("first_p"),
            F.nth_value("o_totalprice", 2).over(w).alias("second_p"),
            F.nth_value("o_totalprice", 3).over(w).alias("third_p"),
            F.row_number()
            .over(
                Window.partitionBy("o_orderpriority").orderBy(
                    F.desc("o_totalprice"), "o_orderkey"
                )
            )
            .alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .select(
            "o_orderpriority",
            F.round("first_p", 2).alias("top1_price"),
            F.round("second_p", 2).alias("top2_price"),
            F.round("third_p", 2).alias("top3_price"),
        )
    )
