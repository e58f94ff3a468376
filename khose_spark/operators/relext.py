"""Relational-surface extensions: subqueries (scalar + correlated),
distribution window functions, multiset set-ops, bitwise aggregates,
positional explode, approximate percentiles.

Subquery determinism note: "above average" predicates compare a money
value against a float average — a last-ulp divergence between engines
could flip rows on the boundary. Both queries therefore compare in
exact integer-decimal space instead: ``price * n > sum`` (decimal ×
bigint and decimal sums are exact in Spark and DuckDB), which is
algebraically identical to ``price > avg``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from khose_spark.registry import query
from khose_spark.tables import t

_DEC = "decimal(18,2)"


@query(
    "q_subq_scalar_global",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_above
    FROM orders
    WHERE CAST(o_totalprice AS DECIMAL(18,2)) * (SELECT count(*) FROM orders)
          > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)
    GROUP BY o_orderpriority
    """,
)
def q_subq_scalar_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery shape: orders priced above the global average,
    counted per priority. Spark plan: the 1-row global aggregate is
    broadcast into the scan's filter — at 100 TB the subquery costs one
    extra pass over one column, no shuffle of the fact table."""
    o = t(spark, sf_dir, "orders")
    g = o.agg(
        F.sum(F.col("o_totalprice").cast(_DEC)).alias("tot"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        o.crossJoin(F.broadcast(g))
        .filter(F.col("o_totalprice").cast(_DEC) * F.col("n") > F.col("tot"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_above"))
    )


@query(
    "q_subq_correlated",
    oracle="""
    SELECT o_orderkey, o_custkey
    FROM orders o
    WHERE CAST(o_totalprice AS DECIMAL(18,2))
          * (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
          > (SELECT sum(CAST(o2.o_totalprice AS DECIMAL(18,2)))
             FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    """,
)
def q_subq_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape: orders priced above their OWN
    customer's average. The oracle states it as two correlated
    subqueries (DuckDB decorrelates them); the Spark plan expresses the
    decorrelated form directly — a window aggregate per custkey, which
    is the single-shuffle plan the optimizer would want at any scale."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    price = F.col("o_totalprice").cast(_DEC)
    return (
        o.withColumn("cust_sum", F.sum(price).over(w))
        .withColumn("cust_n", F.count(F.lit(1)).over(w))
        .filter(price * F.col("cust_n") > F.col("cust_sum"))
        .select("o_orderkey", "o_custkey")
    )


@query(
    "q_win_distribution",
    oracle="""
    WITH ranked AS (
      SELECT c_custkey, c_nationkey,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal, c_custkey) AS rn,
             count(*) OVER (PARTITION BY c_nationkey) AS n
      FROM customer
    )
    SELECT c_custkey, c_nationkey,
           CAST(CASE WHEN n > 1
                     THEN (2*(rn-1)*1000000 + (n-1)) // (2*(n-1))
                     ELSE 0 END AS BIGINT) / 1000000.0 AS pct_rank,
           CAST((2*rn*1000000 + n) // (2*n) AS BIGINT) / 1000000.0 AS cume
    FROM ranked
    """,
)
def q_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank, cume_dist) over
    account balance within nation, with the 6-decimal rounding done in
    EXACT INTEGER space: percent_rank = (rn-1)/(n-1) is a rational, and
    whenever a partition has n-1 = 2^a*5^b rows the value terminates
    exactly on a half-microdecimal, where engine round()s disagree
    (observed at sf0.1: n-1 = 640). round_half_up(k/d, 6) ==
    (2k*10^6 + d) div (2d) in int64 — identical on both engines, then
    one exact /10^6 double division. The unique (acctbal, custkey)
    ordering makes rank == row_number."""
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    wp = Window.partitionBy("c_nationkey")
    ranked = t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wp).alias("n"),
    )
    pct_scaled = F.when(
        F.col("n") > 1,
        F.expr("(2*(rn-1)*1000000 + (n-1)) div (2*(n-1))"),
    ).otherwise(F.lit(0).cast("long"))
    cume_scaled = F.expr("(2*rn*1000000 + n) div (2*n)")
    return ranked.select(
        "c_custkey",
        "c_nationkey",
        (pct_scaled / F.lit(1000000.0)).alias("pct_rank"),
        (cume_scaled / F.lit(1000000.0)).alias("cume"),
    )


@query(
    "q_set_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    """,
)
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection: nationkey occurrences kept with
    min(count_left, count_right) multiplicity."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)


@query(
    "q_set_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
    """,
)
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference: customer nationkey occurrences minus
    supplier occurrences (bag semantics, unlike q_set_except)."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


@query(
    "q_agg_bitwise",
    oracle="""
    SELECT event_type,
           bit_and(user_id) AS ba,
           bit_or(user_id)  AS bo,
           bit_xor(user_id) AS bx
    FROM events GROUP BY event_type
    """,
)
def q_agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates per event type — commutative/associative, so
    partial aggregation is exact at any parallelism."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.bit_and("user_id").alias("ba"),
            F.bit_or("user_id").alias("bo"),
            F.bit_xor("user_id").alias("bx"),
        )
    )


@query(
    "q_fn_posexplode",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), e AS (
      SELECT doc_id,
             unnest(list_transform(range(1, least(len(w), 3) + 1),
                    i -> {'pos': i, 'term': w[i]})) AS pt
      FROM words
    )
    SELECT CAST(pt.pos AS INT) AS pos, pt.term AS term, count(*) AS n
    FROM e GROUP BY 1, 2
    """,
)
def q_fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode: (position, term) counts over each document's
    first three tokens — the ordinality-preserving unnest surface.
    Spark's posexplode emits 0-based positions; +1 aligns with the
    oracle's 1-based list indexing."""
    d = t(spark, sf_dir, "documents")
    head3 = F.slice(F.split("text", " "), 1, 3)
    return (
        d.select(F.posexplode(head3).alias("pos0", "term"))
        .select((F.col("pos0") + 1).cast("int").alias("pos"), "term")
        .groupBy("pos", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query("q_agg_approx_percentile")  # rows-only: sketch-based, engine-specific
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles of order totals per priority
    (approx_percentile sketch — the 100 TB substitute for the exact
    percentile's full sort; rows-only check since sketch internals are
    engine-specific, the exact variant q_agg_percentile carries the
    hash check). Emitted as two SCALAR double columns, not one
    array<double> — the driver canon cannot sort array cells (r2 FAIL)."""
    pcts = (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.percentile_approx(
                "o_totalprice", F.array(F.lit(0.5), F.lit(0.9)), 10000
            ).alias("p")
        )
    )
    return pcts.select(
        "o_orderpriority",
        F.element_at("p", 1).alias("approx_p50"),
        F.element_at("p", 2).alias("approx_p90"),
    )
