"""Composite analytical queries (TPC-H Q3/Q5/Q10 shapes) over the
fixture star schema — multi-join + aggregate + top-k pipelines that
exercise Catalyst's join ordering, broadcast selection, and partial
aggregation together, the way real report queries do.

Plans follow the star-join playbook: the fact table (lineitem/orders)
streams; every dimension (region, nation, customer, supplier) is
broadcast, so the only shuffles are the final group-by exchanges. All
money sums go through the decimal-cast law (khose_spark.sqlutil), which
also makes them order-insensitive — safe under any partial-agg order at
any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from khose_spark.registry import query
from khose_spark.sqlutil import dec_sum, sql_dec_sum
from khose_spark.tables import t

_CUTOFF = "1998-03-15 00:00:00"


@query(
    "q_tpch_q3_shipping",
    oracle=f"""
    SELECT l_orderkey, revenue, o_orderdate, o_orderpriority, rnk FROM (
      SELECT l_orderkey,
             {sql_dec_sum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
             o_orderdate, o_orderpriority,
             row_number() OVER (
               ORDER BY {sql_dec_sum('l_extendedprice * (1 - l_discount)', 4)} DESC,
                        l_orderkey ASC) AS rnk
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '{_CUTOFF}'
        AND l_shipdate  > TIMESTAMP '{_CUTOFF}'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ) WHERE rnk <= 10
    """,
)
def q_tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped orders by revenue for one market
    segment. customer (filtered, broadcast) ⋈ orders ⋈ lineitem; both
    date filters are pushed into the parquet scans; the global top-10 is
    a WindowGroupLimit (partial top-k per partition) — no full sort."""
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("l_orderkey"))
    return (
        agg.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority", "rnk")
    )


@query(
    "q_tpch_q5_local_volume",
    oracle=f"""
    SELECT n_name,
           {sql_dec_sum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q_tpch_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where customer and supplier
    share the nation (6-way star join). True dimensions (region, nation,
    customer, supplier) broadcast; lineitem ⋈ orders — the fact-fact
    join — is left to Catalyst/AQE, which picks broadcast at this scale
    and sort-merge on co-partitioned orderkeys at 100 TB. One final
    25-key aggregation shuffle."""
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = t(spark, sf_dir, "nation")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    revenue = dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        li.join(orders.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              (li.l_suppkey == F.col("s_suppkey"))
              & (F.col("s_nationkey") == F.col("c_nationkey")))
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(revenue.alias("revenue"))
    )


@query(
    "q_tpch_q10_returns",
    oracle=f"""
    SELECT c_custkey, c_name, revenue, n_name, rnk FROM (
      SELECT c_custkey, c_name,
             {sql_dec_sum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
             n_name,
             row_number() OVER (
               ORDER BY {sql_dec_sum('l_extendedprice * (1 - l_discount)', 4)} DESC,
                        c_custkey ASC) AS rnk
      FROM customer
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN orders   ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      GROUP BY c_custkey, c_name, n_name
    ) WHERE rnk <= 20
    """,
)
def q_tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by lost revenue on returned
    items in a half-year window. Returnflag + date filters pushed to the
    scans; customer/nation broadcast; group key is the customer (15k at
    sf0.1 — at 100 TB this is the one genuinely large shuffle, keyed on
    the dense custkey so AQE coalescing keeps partitions even)."""
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(revenue.alias("revenue"))
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (
        agg.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select("c_custkey", "c_name", "revenue", "n_name", "rnk")
    )


@query(
    "q_tpch_q6_forecast",
    oracle=f"""
    SELECT {sql_dec_sum('l_extendedprice * l_discount', 4)} AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue increase from hypothetically dropping
    small-quantity discounts in one year. The whole query is a
    scan→filter→single-row agg: every predicate reaches the parquet
    reader (row-group skipping on l_shipdate), only 4 columns are read,
    and the partial aggregation leaves one row per task — the cheapest
    possible shape at 100 TB."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dec_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
        F.count("*").alias("n_items"),
    )


@query(
    "q_tpch_q4_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_late_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders per priority with at least one lineitem
    shipped more than 60 days after the order date (the fixture schema
    has no commit/receipt dates, so "late" is defined against
    o_orderdate). A left-semi join carries the EXISTS — lineitem is
    never widened into the output, so the join state per order is one
    bit; the date filter on orders is pushed to its scan."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_late_orders")
    )


@query(
    "q_tpch_q7_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_dec_sum('volume', 4)} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between a nation pair by year and
    direction. Both nation dimension copies broadcast; the symmetric
    pair predicate applies AFTER the joins (it needs both nations), but
    the ship-date filter pushes to the lineitem scan. Group key is 4
    small values — one final shuffle."""
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k1"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k2"), F.col("n_name").alias("cust_nation")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    joined = (
        li.join(t(spark, sf_dir, "orders"), li.l_orderkey == F.col("o_orderkey"))
        .join(
            F.broadcast(t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("k1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("k2"))
        .filter(pair)
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "revenue"
        )
    )


@query(
    "q_tpch_q12_shipmode",
    oracle="""
    SELECT l_returnflag AS ship_group,
           count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
             AS high_line_count,
           count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
             AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    """,
)
def q_tpch_q12_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per ship group, how many LATE lineitems belonged
    to high- vs low-priority orders (the shipping-mode audit). The
    fixture schema has no l_shipmode/commit/receipt dates, so the group
    key is l_returnflag and "late" is shipdate > orderdate + 60 days,
    as in q_tpch_q4_priority. The plan is the Q12 plan: a fact-fact
    join (orders ⋈ lineitem — AQE picks the strategy; sort-merge on
    co-partitioned orderkeys at 100 TB), a conditional-CASE aggregation,
    and a 3-row group key; the ship-date year filter pushes to the
    lineitem scan, the late predicate applies at the join."""
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy(F.col("l_returnflag").alias("ship_group"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@query(
    "q_tpch_q14_promo",
    oracle="""
    WITH flat AS (
      SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(28,4))) * 10000 AS BIGINT) AS total_u,
             CAST(sum(CASE WHEN p_type = 'PROMO'
                           THEN CAST(l_extendedprice * (1 - l_discount)
                                     AS DECIMAL(28,4)) END) * 10000
                  AS BIGINT) AS promo_u
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    )
    SELECT CAST(coalesce(promo_u, 0) AS BIGINT) AS promo_u,
           total_u,
           CAST((2 * coalesce(promo_u, 0) * 10000 + total_u)
                // (2 * total_u) AS BIGINT) AS promo_bp
    FROM flat
    """,
)
def q_tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotional parts' share of one month's revenue,
    in exact basis points (the conditional-revenue-ratio query). Same
    decimal-exact idiom as q_tpch_q8_market_share: both revenue sums
    become integer 1e-4 units and the share uses the int64 half-up div
    — no float ratio anywhere, so the hash check is exact. The month
    filter pushes to the lineitem scan (one month ≈ 1/80 of rows at
    any scale); part broadcasts; the single-row aggregate is free."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    dec = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,4)"
    )
    flat = (
        li.join(F.broadcast(part), li.l_partkey == F.col("p_partkey"))
        .agg(
            (F.sum(dec) * 10000).cast("long").alias("total_u"),
            (F.sum(F.when(F.col("p_type") == "PROMO", dec)) * 10000)
            .cast("long")
            .alias("promo_u"),
        )
    )
    return flat.select(
        F.coalesce("promo_u", F.lit(0)).alias("promo_u"),
        "total_u",
        F.expr(
            "(2 * coalesce(promo_u, 0) * 10000 + total_u) div (2 * total_u)"
        ).alias("promo_bp"),
    )


@query(
    "q_tpch_q19_discount",
    oracle=f"""
    SELECT {sql_dec_sum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three OR'd (brand, size, quantity)
    bands — the classic OR-of-ANDs predicate. Catalyst cannot push a
    cross-table OR through the join, so the single-table residues are
    pushed MANUALLY (the textbook Q19 rewrite): part keeps only rows
    satisfying some (brand, size) arm, lineitem only quantities in the
    union range [1, 30] — both reach the parquet scans — and the exact
    three-arm predicate re-applies on the joined row. Part broadcasts;
    the output is one row."""
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    part_residue = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#24") & F.col("p_size").between(1, 15))
    )
    part = t(spark, sf_dir, "part").filter(part_residue).select(
        "p_partkey", "p_brand", "p_size"
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(1, 30)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == F.col("p_partkey"))
        .filter(
            arm("Brand#12", 5, 1, 11)
            | arm("Brand#23", 10, 10, 20)
            | arm("Brand#24", 15, 20, 30)
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q_tpch_q8_market_share",
    oracle="""
    WITH flat AS (
      SELECT year(o_orderdate) AS o_year,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(28,4))) * 10000 AS BIGINT) AS total_u,
             CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
                           THEN CAST(l_extendedprice * (1 - l_discount)
                                     AS DECIMAL(28,4)) END) * 10000
                  AS BIGINT) AS nation_u
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1
    )
    SELECT o_year,
           CAST(coalesce(nation_u, 0) AS BIGINT) AS nation_u,
           total_u,
           CAST((2 * coalesce(nation_u, 0) * 10000 + total_u)
                // (2 * total_u) AS BIGINT) AS share_bp
    FROM flat
    """,
)
def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's market share (in exact
    basis points) of a region's order volume for one part type, by
    year. Share = nation/total is a ratio of decimal sums, so both
    sums convert to exact integer 1e-4 units and the basis-point share
    is computed with the int64 half-up div idiom — no float ratio to
    round. All dimensions broadcast; the fact joins and the 2-row year
    aggregate are the only shuffles."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k1"), F.col("n_regionkey").alias("rk")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k2"), F.col("n_name").alias("supp_nation")
    )
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dec = vol.cast("decimal(28,4)")
    flat = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
              li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("k1"))
        .join(F.broadcast(region.select("r_regionkey")), F.col("rk") == F.col("r_regionkey"))
        .join(F.broadcast(t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")),
              li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("k2"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(dec) * 10000).cast("long").alias("total_u"),
            (F.sum(F.when(F.col("supp_nation") == "NATION_3", dec)) * 10000)
            .cast("long")
            .alias("nation_u"),
        )
    )
    return flat.select(
        "o_year",
        F.coalesce("nation_u", F.lit(0)).alias("nation_u"),
        "total_u",
        F.expr(
            "(2 * coalesce(nation_u, 0) * 10000 + total_u) div (2 * total_u)"
        ).alias("share_bp"),
    )


@query(
    "q_tpch_q17_small_qty",
    oracle="""
    WITH avgq AS (
      SELECT l_partkey AS ap_partkey, avg(l_quantity) AS avg_qty
      FROM lineitem GROUP BY 1
    ), flat AS (
      SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) * 100
                  AS BIGINT) AS revenue_c
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN avgq ON ap_partkey = l_partkey
      WHERE p_size <= 5 AND l_quantity < 0.2 * avg_qty
    )
    SELECT revenue_c, CAST(revenue_c // 7 AS BIGINT) AS avg_yearly_c
    FROM flat
    """,
)
def q_tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue that would be lost by not filling
    small-quantity orders for small parts (fixture adaptation: the
    Brand/container filter becomes ``p_size <= 5`` — this fixture's part
    table has no p_container column). The correlated per-part
    ``0.2 * avg(l_quantity)`` subquery is decorrelated into one
    per-partkey aggregate joined back on partkey — the same
    aggregate-then-join plan Catalyst produces for the correlated form,
    written explicitly so the partkey shuffle is shared. Money output in
    exact integer cents with the int64 floor-div idiom (revenue/7) —
    no float quotient to round."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    avgq = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    flat = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(avgq, li.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(28,2)")) * 100)
            .cast("long")
            .alias("revenue_c")
        )
    )
    return flat.select(
        "revenue_c", F.expr("revenue_c div 7").alias("avg_yearly_c")
    )


@query(
    "q_tpch_q18_large_volume",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    HAVING sum(l_quantity) > 250
    """,
)
def q_tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume customers — orders whose total
    quantity exceeds 250. Plan: the HAVING filter is applied to a
    lineitem-only per-orderkey aggregate FIRST (a ~1% selectivity
    semi-reduction), and only surviving orderkeys join into
    orders ⋈ customer — at 100 TB this is the difference between
    shuffling all of lineitem x orders and shuffling a few thousand
    qualifying keys. Quantity sums are integral doubles (exact, order-
    insensitive); o_totalprice passes through unaggregated."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust.select("c_custkey", "c_name")),
              orders.o_custkey == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", F.col("sum_qty").cast("double").alias("sum_qty"),
        )
    )


@query(
    "q_tpch_q21_waiting_supplier",
    oracle="""
    WITH flags AS (
      SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS is_late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    )
    SELECT s_name, count(*) AS numwait
    FROM flags l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE l1.is_late
      AND EXISTS (SELECT 1 FROM flags l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM flags l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.is_late)
    GROUP BY s_name
    """,
)
def q_tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    finished multi-supplier order (fixture adaptation: "late" is
    ``l_shipdate > o_orderdate + 90 days`` — this fixture's lineitem has
    no commit/receipt dates). The classic EXISTS / NOT EXISTS pair of
    correlated self-joins (the oracle keeps that form) is decorrelated
    into ONE per-order aggregate — n_supp = distinct suppliers,
    n_late_supp = distinct LATE suppliers — joined back on orderkey:
    a late row qualifies iff n_supp >= 2 and n_late_supp = 1 (itself).

    r13 optimization (guide §2.3/§2.4): the decorrelated form used to
    build the flags relation twice (per-order stats + the late-row
    stream) and pay a double countDistinct — an Expand that doubles the
    fact rows into the stats shuffle — plus a fact-sized sort-merge
    join back. Both are avoidable because every per-order quantity is
    derivable from ONE per-(order, supplier) aggregate: after
    repartitioning the flag rows by orderkey, the pair aggregate, the
    per-order window counts (n_supp = pairs in the order, n_late_supp =
    late pairs), and the qualification filter all run inside that one
    exchange, and numwait comes back as sum(late_rows) instead of
    re-counting late fact rows. One lineitem scan instead of two, one
    fact-sized shuffle instead of three (stats Expand + SMJ both
    sides), no Expand — the shape that survives open scale. The driver
    hash-match against the EXISTS-form oracle certifies the rewrite."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = t(spark, sf_dir, "supplier")
    flags = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .alias("is_late"),
    )
    # One hash exchange on orderkey serves the pair aggregate AND the
    # per-order window (ClusteredDistribution on a grouping-key subset).
    pairs = (
        flags.repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max("is_late").alias("supp_late"),
            F.sum(F.when(F.col("is_late"), 1).otherwise(0)).alias("late_rows"),
        )
    )
    w = Window.partitionBy("l_orderkey")
    return (
        pairs.select(
            "l_orderkey",
            "l_suppkey",
            "supp_late",
            "late_rows",
            F.count(F.lit(1)).over(w).alias("n_supp"),
            F.sum(F.col("supp_late").cast("int")).over(w).alias("n_late_supp"),
        )
        .filter(
            F.col("supp_late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
        )
        .join(F.broadcast(supp.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("late_rows").alias("numwait"))
    )


_Q22_NATIONS = (1, 3, 5, 7, 9, 11)
_Q22_RECENT = "1999-01-01 00:00:00"


@query(
    "q_tpch_q22_global_sales",
    oracle=f"""
    WITH cohort AS (
      SELECT c_custkey, c_acctbal, c_nationkey FROM customer
      WHERE c_nationkey IN {_Q22_NATIONS}
    ), avg_bal AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE)
             / count(*) AS ab
      FROM cohort WHERE c_acctbal > 0
    )
    SELECT c_nationkey AS cntrycode, count(*) AS numcust,
           {sql_dec_sum('c_acctbal', 2)} AS totacctbal
    FROM cohort, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '{_Q22_RECENT}')
    GROUP BY 1
    """,
)
def q_tpch_q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy-but-dormant customers per country
    (fixture adaptation: the phone-prefix country code becomes
    c_nationkey — this fixture's customer has no c_phone — and
    "never ordered" becomes "no order since 1999", since every fixture
    customer has old orders). Plan: the global average balance is a
    1-row aggregate broadcast-crossed into the cohort (scalar-subquery
    pattern); dormancy is a LEFT ANTI join against the date-filtered
    orders scan (the filter pushes to parquet); the decimal-sum law
    keeps the average and total exact in both engines."""
    cutoff = F.lit(_Q22_RECENT).cast("timestamp")
    cohort = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(*_Q22_NATIONS))
        .select("c_custkey", "c_acctbal", "c_nationkey")
    )
    avg_bal = cohort.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(28,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("ab")
    )
    recent = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= cutoff)
        .select("o_custkey")
    )
    return (
        cohort.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, cohort.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dec_sum(F.col("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "q_tpch_q13_order_counts",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q_tpch_q13_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the customer-by-order-count distribution,
    including zero-order customers (fixture adaptation: the classic
    comment NOT LIKE exclusion becomes "not 1-URGENT" — orders has no
    comment column). The oracle keeps the classic left-join-then-count
    form; the Spark plan pre-aggregates orders per custkey FIRST (one
    fact shuffle at the smallest possible width), then LEFT-joins the
    customer dim against the broadcast per-customer counts and
    coalesces absent counts to zero — the hash-match certifies the
    rewrite. At 100 TB the pre-aggregation is the difference between
    shuffling |orders| rows and |customers| rows."""
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    ocnt = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        cust.join(F.broadcast(ocnt), cust.c_custkey == ocnt.o_custkey, "left")
        .select(F.coalesce(F.col("n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


_Q15_START = "1996-01-01 00:00:00"
_Q15_END = "1996-04-01 00:00:00"


@query(
    "q_tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dec_sum('l_extendedprice * (1 - l_discount)', 4)}
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{_Q15_START}'
        AND l_shipdate <  TIMESTAMP '{_Q15_END}'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue.
    The view + scalar-subquery-max of the classic form decorrelates to
    a 1-row max aggregate broadcast-crossed into the per-supplier
    revenue relation (the house scalar-subquery idiom); equality on
    the revenue double is safe because both engines produce it through
    the decimal-cast law (2-decimal exact). Shipdate range pushes to
    the scan; one supplier-keyed aggregation shuffle; supplier dim
    broadcast."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q15_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q15_END).cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
        .alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )
