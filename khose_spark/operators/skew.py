"""Skew-mitigation utilities (SURVEY.md §4 scale posture).

At 100 TB a shuffled join on a key with a hot value (one user, one
null-bucket, one viral document) puts that key's entire volume on a
single reducer. Spark's first line of defense is AQE skew-join
splitting (enabled by the session factory); this module provides the
second — explicit **salting** — as a reusable library operator, plus a
registered query proving the salted plan is semantically identical to
the plain join (same DuckDB oracle as an unsalted join would use).

How it works: the skewed (large) side gets a deterministic salt in
[0, n); the small side is exploded n× with every salt value; the join
key becomes (key, salt), splitting each hot key across n reducers. The
explode multiplies only the SMALL side, so total shuffle volume grows
by |small| × (n-1) — negligible when small is a dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from khose_spark.registry import query
from khose_spark.sqlutil import dec_sum, sql_dec_sum
from khose_spark.tables import t

_SALT = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``large`` ⋈ ``small`` on the equi-condition ``on`` with the
    large side salted across ``n_salts`` sub-keys.

    The salt is derived from a hash of the large side's whole row
    (xxhash64 over all columns) — deterministic, uniform, and requiring
    no unique-id column. Works for inner and left joins (the small side
    is replicated, so no small-side rows are invented or lost)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_large = large.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(n_salts))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(_SALT)
    salted_small = small.select("*", salts).withColumn(
        _SALT, F.col(_SALT).cast("bigint")
    )
    joined = salted_large.join(
        salted_small, on & (salted_large[_SALT] == salted_small[_SALT]), how
    )
    return joined.drop(_SALT)


@query(
    "q_join_salted",
    oracle=f"""
    SELECT c_mktsegment,
           count(*) AS n_events,
           {sql_dec_sum('value')} AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join equivalence proof: events (behaving as the skewed fact
    side) ⋈ customer on user_id = c_custkey through ``salted_join``,
    then a rollup identical to what the plain join would produce — the
    oracle IS the plain join, so the hash-match certifies the salt
    machinery invents/loses nothing."""
    ev = t(spark, sf_dir, "events")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(ev, cust, F.col("user_id") == F.col("c_custkey"))
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        # dec_sum accumulates in DECIMAL(28,4) — a DECIMAL(18,*) cast of the
        # finished sum would overflow (-> NULL) once the fact side is large.
        dec_sum(F.col("value")).alias("total_value"),
    )


@query(
    "q_scan_key_skew",
    oracle="""
    WITH counts AS (
      SELECT o_custkey AS key, count(*) AS cnt FROM orders GROUP BY 1
    ), ranked AS (
      SELECT key, cnt,
             row_number() OVER (ORDER BY cnt DESC, key ASC) AS rnk,
             CAST(sum(cnt) OVER () AS BIGINT) AS total
      FROM counts
    )
    SELECT key, cnt, rnk, total,
           CAST((2 * cnt * 1000 + total) // (2 * total) AS BIGINT) AS permille
    FROM ranked WHERE rnk <= 10
    """,
)
def q_scan_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler: the top-10 heaviest o_custkey values with
    their exact row counts and integer permille share — the diagnostic
    run before choosing between a plain, broadcast, or salted join
    (khose_spark.operators.skew.salted_join is the remedy it points
    at). One count aggregation on the key; the ranking window runs over
    the already-aggregated key counts (WindowGroupLimit prunes to 10
    rows per partition before the final sort), and the grand total comes
    from a 1-row partial-then-final aggregate broadcast-crossed back in
    — NOT ``sum().over(Window.partitionBy())``, which would drag every
    distinct key's count onto one partition (~10⁹ rows at 100×). The
    share is exact integer arithmetic (no rounded ratio)."""
    orders = t(spark, sf_dir, "orders")
    counts = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count("*").alias("cnt")
    )
    # sum(cnt) over all keys == count(*) of the table: compute the grand
    # total as a zero-column count scan instead of re-aggregating by key.
    total = orders.agg(F.count("*").cast("bigint").alias("total"))
    w = Window.orderBy(F.desc("cnt"), F.asc("key"))
    top10 = (
        counts.select("key", "cnt", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 10)
    )
    return top10.crossJoin(F.broadcast(total)).select(
        "key",
        "cnt",
        "rnk",
        "total",
        F.expr("(2 * cnt * 1000 + total) div (2 * total)").alias("permille"),
    )
