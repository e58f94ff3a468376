"""Projection / filter / predicate operators (SURVEY.md §2.2).

These exist to prove the scan-layer contract at 100 TB: every predicate
here reaches the parquet reader as a PushedFilter and every projection
prunes the read schema (verified by tests/test_plans.py explain audits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from khose_spark.registry import query
from khose_spark.sqlutil import dec_round, sql_dec_round
from khose_spark.tables import t


@query(
    "q_project_arith",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {sql_dec_round('l_extendedprice * (1 - l_discount)')} AS net
    FROM lineitem
    """,
)
def q_project_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic projection; only 4 of 11 lineitem columns are read.

    Money product -> dec_round (exact-decimal rounding law, sqlutil)."""
    return t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        dec_round(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
    )


@query(
    "q_filter_compare",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_quantity > 30 AND l_discount BETWEEN 0.02 AND 0.06
    """,
)
def q_filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison + BETWEEN predicates — pushed down to row-group stats."""
    return (
        t(spark, sf_dir, "lineitem")
        .filter((F.col("l_quantity") > 30) & F.col("l_discount").between(0.02, 0.06))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    )


@query(
    "q_filter_in_like",
    oracle="""
    SELECT p_partkey, p_brand, p_type
    FROM part
    WHERE p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
      AND p_type LIKE '%BRASS%'
    """,
)
def q_filter_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + LIKE predicates."""
    p = t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#33")
        & F.col("p_type").like("%BRASS%")
    ).select("p_partkey", "p_brand", "p_type")


@query(
    "q_filter_null_bool",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE (nullif(o_orderpriority, '5-LOW') IS NULL AND o_orderstatus = 'F')
       OR (NOT o_orderstatus = 'F' AND o_orderpriority = '1-URGENT')
    """,
)
def q_filter_null_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / NOT / OR combination (nulls injected via nullif — the
    fixtures carry no native nulls, FIXTURES.md)."""
    o = t(spark, sf_dir, "orders")
    pr_null = F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")).isNull()
    return o.filter(
        (pr_null & (F.col("o_orderstatus") == "F"))
        | (~(F.col("o_orderstatus") == "F") & (F.col("o_orderpriority") == "1-URGENT"))
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority")


@query(
    "q_project_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def q_project_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection — hash-aggregate with map-side partials."""
    return t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@query(
    "q_filter_regexp",
    oracle="""
    SELECT lang, count(*) AS n_docs
    FROM documents
    WHERE regexp_matches(text, 'join.*filter')
    GROUP BY lang
    """,
)
def q_filter_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex predicate (RLIKE) + grouped count."""
    return (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").rlike("join.*filter"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
