"""TPC-H Q2/Q9/Q11/Q16/Q20 shapes over a SYNTHESIZED partsupp table.

The driver fixtures ship no ``partsupp`` (SURVEY.md §2.11 note), which
blocked the five classic TPC-H queries that need it. Rather than wait
for a fixture, ``partsupp`` is derived DETERMINISTICALLY from tables
both engines already share — pure int64 arithmetic over ``part`` keys
and the ``supplier`` row count — so the Spark DataFrame and the DuckDB
oracle CTE materialize bit-identical relations:

    S            = count(*) FROM supplier           (4 | S in every fixture)
    for i in 0..3:
      ps_partkey   = p_partkey
      ps_suppkey   = (p_partkey * 7 + i * (S div 4)) % S     -- 4 distinct
      ps_costcents = (ps_partkey*31 + ps_suppkey*17) % 99900 + 100
      ps_availqty  = (ps_partkey*13 + ps_suppkey*7)  % 9999  + 1
      ps_supplycost = double(ps_costcents) / 100              -- 1.00..1000.99

Money stays in integer CENTS through every filter / min / sum and is
divided out to dollars only in the final projection, so no float ever
enters a comparison or a group key — the cross-engine determinism law
(khose_spark.sqlutil) with zero decimal casts needed.

Scale posture: partsupp is 4×|part| rows of five fixed-width columns —
a derived dimension. It broadcasts in every query below; at 100 TB the
real table would be read from parquet instead and AQE would keep the
broadcast while it fits, falling back to sort-merge on the two-column
key otherwise. The generation itself is embarrassingly parallel (a
projection + a 4-row explode, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from khose_spark.registry import query
from khose_spark.sqlutil import dec_sum, sql_dec_sum
from khose_spark.tables import t

# DuckDB twin of synth_partsupp(). Prepend to every oracle: WITH {_SQL_PARTSUPP}
_SQL_PARTSUPP = """
    s_cnt AS (SELECT count(*) AS n FROM supplier),
    ps0 AS (
      SELECT p_partkey AS ps_partkey,
             (p_partkey * 7 + g.i * (n // 4)) % n AS ps_suppkey
      FROM part, s_cnt, (VALUES (0),(1),(2),(3)) AS g(i)
    ),
    partsupp AS (
      SELECT ps_partkey, ps_suppkey,
             (ps_partkey * 31 + ps_suppkey * 17) % 99900 + 100 AS ps_costcents,
             (ps_partkey * 13 + ps_suppkey * 7) % 9999 + 1 AS ps_availqty
      FROM ps0
    )"""


def synth_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic partsupp: 4 suppliers per part, int64 arithmetic
    only (see module docstring). One projection + explode — no shuffle;
    the supplier count arrives as a broadcast 1-row cross join (the
    scalar-subquery idiom, never a driver-side collect)."""
    part = t(spark, sf_dir, "part").select("p_partkey")
    s_cnt = t(spark, sf_dir, "supplier").agg(F.count(F.lit(1)).alias("n"))
    ps0 = (
        part.crossJoin(F.broadcast(s_cnt))
        .select(
            "p_partkey",
            "n",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"),
        )
        .select(
            "p_partkey",
            ((F.col("p_partkey") * 7
              + F.col("i").cast("bigint") * F.expr("n div 4"))
             % F.col("n")).alias("ps_suppkey"),
        )
    )
    return ps0.select(
        F.col("p_partkey").alias("ps_partkey"),
        "ps_suppkey",
        ((F.col("p_partkey") * 31 + F.col("ps_suppkey") * 17) % 99900 + 100)
        .alias("ps_costcents"),
        ((F.col("p_partkey") * 13 + F.col("ps_suppkey") * 7) % 9999 + 1)
        .alias("ps_availqty"),
    )


@query(
    "q_tpch_q2_min_cost_supp",
    oracle=f"""
    WITH {_SQL_PARTSUPP},
    eligible AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ), costed AS (
      SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name, ps_costcents,
             min(ps_costcents) OVER (PARTITION BY p_partkey) AS min_cents
      FROM partsupp
      JOIN part ON ps_partkey = p_partkey
      JOIN eligible ON ps_suppkey = s_suppkey
      WHERE p_type = 'ECONOMY' AND p_size BETWEEN 1 AND 15
    )
    SELECT s_acctbal, s_name, n_name, p_partkey,
           CAST(ps_costcents AS DOUBLE) / 100 AS ps_supplycost, rnk
    FROM (
      SELECT *, row_number() OVER (
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey) AS rnk
      FROM costed WHERE ps_costcents = min_cents
    ) WHERE rnk <= 100
    """,
)
def q_tpch_q2_min_cost_supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each ECONOMY part of size 1–15, the
    cheapest EUROPE supplier(s); top-100 by supplier account balance.
    Plan: partsupp (derived dim) joins broadcast part + broadcast
    eligible-supplier dims; the per-part min is a window over the
    partsupp partition (cents, so an integer compare, no float-min
    trap); the global top-100 is a WindowGroupLimit — partial top-k per
    partition, no full sort. All joins broadcast ⇒ the only exchange is
    the final 1-partition window."""
    ps = synth_partsupp(spark, sf_dir)
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "ECONOMY") & F.col("p_size").between(1, 15)
    ).select("p_partkey")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costed = (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(F.broadcast(eligible), ps.ps_suppkey == F.col("s_suppkey"))
        .withColumn(
            "min_cents",
            F.min("ps_costcents").over(Window.partitionBy("p_partkey")),
        )
        .filter(F.col("ps_costcents") == F.col("min_cents"))
    )
    w = Window.orderBy(
        F.desc("s_acctbal"), "n_name", "s_name", "p_partkey", "s_suppkey"
    )
    return (
        costed.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 100)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey",
            (F.col("ps_costcents").cast("double") / 100).alias("ps_supplycost"),
            "rnk",
        )
    )


@query(
    "q_tpch_q9_product_profit",
    oracle=f"""
    WITH {_SQL_PARTSUPP}
    SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
           {sql_dec_sum(
               'l_extendedprice * (1 - l_discount)'
               ' - (ps_costcents * l_quantity) / CAST(100 AS DOUBLE)', 4)}
             AS sum_profit
    FROM lineitem
    JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q_tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus supply cost) by supplier
    nation × order year for parts named *red*. The lineitem ⋈ partsupp
    two-column equi-join prices each line at its catalog cost; with the
    synthesized partsupp the match is sparse (only lines whose supplier
    is one of the part's 4 catalog suppliers), identically in both
    engines. Plan: the fact table streams once; partsupp, part,
    supplier, nation all broadcast; orders ⋈ lineitem is the one
    fact-fact join (AQE broadcast here, sort-merge at 100 TB); one
    final (nation, year) aggregation shuffle. Profit is summed under
    the decimal-cast law — cents*qty is exact in doubles, so the
    decimal(28,4) accumulator sees exact inputs."""
    ps = synth_partsupp(spark, sf_dir)
    li = t(spark, sf_dir, "lineitem")
    part = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - (F.col("ps_costcents") * F.col("l_quantity")) / F.lit(100).cast("double")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(ps),
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dec_sum(profit, 4).alias("sum_profit"))
    )


@query(
    "q_tpch_q11_important_stock",
    oracle=f"""
    WITH {_SQL_PARTSUPP},
    scoped AS (
      SELECT ps_partkey, ps_costcents * ps_availqty AS value_cents
      FROM partsupp
      JOIN supplier ON ps_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
    ), total AS (SELECT sum(value_cents) AS total_cents FROM scoped)
    SELECT ps_partkey,
           CAST(sum(value_cents) AS DOUBLE) / 100 AS stock_value
    FROM scoped, total
    GROUP BY ps_partkey, total_cents
    HAVING sum(value_cents) * 200 > total_cents
    """,
)
def q_tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose stock value held by suppliers in
    three nations exceeds 0.5% of the total. value = cost_cents ×
    availqty is a pure int64 product summed exactly (no float until the
    final dollars projection), and the threshold compare is
    ``sum*200 > total`` — integer on both engines. Plan: the grand
    total is a 1-row aggregate broadcast-crossed into the per-part
    aggregate (scalar-subquery idiom); supplier/nation broadcast; one
    aggregation shuffle on ps_partkey."""
    ps = synth_partsupp(spark, sf_dir)
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11")
    )
    scoped = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "ps_partkey",
            (F.col("ps_costcents") * F.col("ps_availqty")).alias("value_cents"),
        )
    )
    total = scoped.agg(F.sum("value_cents").alias("total_cents"))
    return (
        scoped.groupBy("ps_partkey")
        .agg(F.sum("value_cents").alias("sum_cents"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("sum_cents") * 200 > F.col("total_cents"))
        .select(
            "ps_partkey",
            (F.col("sum_cents").cast("double") / 100).alias("stock_value"),
        )
    )


@query(
    "q_tpch_q16_supplier_cnt",
    oracle=f"""
    WITH {_SQL_PARTSUPP}
    SELECT p_brand, p_type, p_size,
           count(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can provide each
    (brand, type, size) bucket, excluding one brand, one type, and
    suppliers in arrears (fixture adaptation: the classic
    customer-complaints exclusion becomes ``s_acctbal < 0`` — this
    fixture's supplier has no comment column). Plan: broadcast
    LEFT ANTI join against the (tiny) bad-supplier list — never a
    NOT IN re-probe; part dim broadcast; one distinct-count
    aggregation shuffle on the 3-part group key."""
    ps = synth_partsupp(spark, sf_dir)
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(F.broadcast(bad), ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q20_excess_stock",
    oracle=f"""
    WITH {_SQL_PARTSUPP},
    shipped AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1, 2
    ), excess AS (
      SELECT DISTINCT ps_suppkey
      FROM partsupp
      JOIN part ON ps_partkey = p_partkey AND p_name LIKE 'small%'
      JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      WHERE 2 * ps_availqty > qty
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier
    JOIN excess ON s_suppkey = ps_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
    """,
)
def q_tpch_q20_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: EUROPE suppliers holding excess stock of a
    *small* part — catalog availability more than half the quantity
    they actually shipped in 1996. The classic correlated subquery
    (ps_availqty > 0.5 * shipped-for-this-pair) is decorrelated into a
    pre-aggregated shipped relation joined on the pair key; the
    threshold compare is ``2*availqty > qty`` (int64 × exact-integral
    double — no 0.5 literal, no float grid). Plan: the 1996 shipdate
    filter pushes into the lineitem scan, the pair aggregation is the
    one fact shuffle; partsupp + part broadcast into it; the qualifying
    supplier set is a broadcast semi-join into the supplier dim."""
    ps = synth_partsupp(spark, sf_dir)
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    part = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    excess = (
        shipped.join(
            F.broadcast(ps),
            (shipped.l_partkey == ps.ps_partkey)
            & (shipped.l_suppkey == ps.ps_suppkey),
        )
        .join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .filter(2 * F.col("ps_availqty") > F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp = t(spark, sf_dir, "supplier")
    return (
        supp.join(
            F.broadcast(excess), supp.s_suppkey == F.col("ps_suppkey"), "left_semi"
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
