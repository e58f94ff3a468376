"""Data-quality / profiling / CDC-merge operators (SURVEY.md §2.12
extension — the audit surface every production lakehouse pipeline runs
before and after a big transform).

Three shapes:

* ``q_profile_columns`` — one-pass column profiler (the ``DESCRIBE``
  /`dbt docs`-style summary): null counts, exact distinct counts,
  min/max/avg per numeric column, computed in a SINGLE scan with
  map-side partial aggregation and then transposed driver-free with
  ``stack()``.  At 100 TB the exact ``count(DISTINCT)`` would switch to
  ``approx_count_distinct`` (HLL, one pass, no Expand) — exact is kept
  here because the oracle hash-checks it.
* ``q_dq_expectations`` — declarative expectations (Great-Expectations
  shape): row-local range/domain rules compiled into ONE ``sum(CASE)``
  pass over lineitem, plus a referential-integrity rule (orphan
  ``l_orderkey``) as a left-anti join.  Rules are data-parallel by
  construction; the output is one row per rule.
* ``q_cdc_merge_upsert`` — batch MERGE/upsert summary: latest change
  per key from the events CDC feed (deterministic ``row_number`` pick),
  full-outer-merged into the supplier dimension, classified
  insert/update/keep with exact-decimal balance totals.  Full-outer
  merge shuffles both sides on the key — at 100 TB the base table would
  be bucketed by key so only the (much smaller) change feed moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from khose_spark.registry import query
from khose_spark.sqlutil import dec_sum, sql_dec_sum
from khose_spark.tables import t

_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@query(
    "q_profile_columns",
    oracle="""
    SELECT 'l_quantity' AS col_name, count(*) AS n_rows,
           CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           count(DISTINCT l_quantity) AS n_distinct,
           min(l_quantity) AS min_val, max(l_quantity) AS max_val,
           round(avg(l_quantity), 6) AS avg_val
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', count(*),
           CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT l_extendedprice),
           min(l_extendedprice), max(l_extendedprice),
           round(avg(l_extendedprice), 6)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', count(*),
           CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT l_discount),
           min(l_discount), max(l_discount), round(avg(l_discount), 6)
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', count(*),
           CAST(sum(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT l_tax),
           min(l_tax), max(l_tax), round(avg(l_tax), 6)
    FROM lineitem
    """,
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan numeric column profile of lineitem, transposed to one
    row per column with ``stack()`` — no per-column rescan (the oracle's
    UNION ALL shape is the naive 4-scan plan this replaces).  The only
    shuffle is the one final aggregation; the multi-``count(DISTINCT)``
    uses Spark's Expand rewrite (rows × 4 map-side, still one
    exchange)."""
    li = t(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__dist"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            F.round(F.avg(c), 6).alias(f"{c}__avg"),
        ]
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__null, {c}__dist, {c}__min, {c}__max, {c}__avg"
        for c in _PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(col_name, n_null, n_distinct, min_val, max_val, avg_val)",
        "n_rows",
    ).select(
        "col_name", "n_rows", "n_null", "n_distinct",
        "min_val", "max_val", "avg_val",
    )


# (rule name, violation predicate — SQL text valid in BOTH engines)
_DQ_RULES = [
    ("qty_in_5_45", "NOT (l_quantity BETWEEN 5 AND 45)"),
    ("price_under_80k", "l_extendedprice > 80000"),
    ("discount_max_8pct", "l_discount > 0.08"),
    ("tax_max_6pct", "l_tax > 0.06"),
    ("returnflag_in_A_N", "l_returnflag NOT IN ('A', 'N')"),
]


@query(
    "q_dq_expectations",
    oracle=f"""
    WITH rowrules AS (
        {" UNION ALL ".join(
            f'''SELECT '{name}' AS rule, count(*) AS n_checked,
                CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_violations
                FROM lineitem'''
            for name, pred in _DQ_RULES
        )}
        UNION ALL
        SELECT 'orderkey_fk', count(*),
               CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT rule, n_checked, n_violations,
           round(CAST(n_violations AS DOUBLE) / n_checked, 6) AS viol_rate
    FROM rowrules
    """,
)
def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations: 5 row-local range/domain
    rules evaluated in ONE ``sum(CASE)`` scan (transposed with
    ``stack()``), plus a referential-integrity rule (lineitem rows whose
    ``l_orderkey`` has no parent order) via left-anti join.  Row-local
    rules cost one scan regardless of rule count — the shape that lets a
    100 TB pipeline run dozens of expectations per table per day."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")

    aggs = [F.count(F.lit(1)).alias("n_checked")]
    for name, pred in _DQ_RULES:
        aggs.append(
            F.sum(F.expr(pred).cast("long")).alias(f"{name}__viol")
        )
    one = li.agg(*aggs)
    stack_args = ", ".join(f"'{name}', {name}__viol" for name, _ in _DQ_RULES)
    rowrules = one.selectExpr(
        f"stack({len(_DQ_RULES)}, {stack_args}) AS (rule, n_violations)",
        "n_checked",
    )

    fk = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("orderkey_fk").alias("rule"), "n_violations")
    )
    n_checked_row = li.agg(F.count(F.lit(1)).alias("n_checked"))
    fk = fk.crossJoin(F.broadcast(n_checked_row))

    out = rowrules.select("rule", "n_checked", "n_violations").unionByName(
        fk.select("rule", "n_checked", "n_violations")
    )
    return out.select(
        "rule",
        "n_checked",
        "n_violations",
        F.round(F.col("n_violations").cast("double") / F.col("n_checked"), 6)
        .alias("viol_rate"),
    )


@query(
    "q_cdc_merge_upsert",
    oracle=f"""
    WITH latest AS (
        SELECT user_id, value AS new_bal
        FROM (
            SELECT user_id, value, ts, event_id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE event_type = 'purchase'
        ) WHERE rn = 1
    ),
    merged AS (
        SELECT COALESCE(s_suppkey, user_id) AS key,
               CASE WHEN s_suppkey IS NOT NULL AND user_id IS NOT NULL
                        THEN 'update'
                    WHEN s_suppkey IS NULL THEN 'insert'
                    ELSE 'keep' END AS action,
               COALESCE(new_bal, s_acctbal) AS balance
        FROM supplier FULL OUTER JOIN latest ON s_suppkey = user_id
    )
    SELECT action, count(*) AS n_rows,
           CAST(min(key) AS BIGINT) AS min_key,
           CAST(max(key) AS BIGINT) AS max_key,
           {sql_dec_sum('balance', 2)} AS sum_balance
    FROM merged GROUP BY action
    """,
)
def q_cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch CDC MERGE: the purchase-event feed is reduced to one latest
    change per key (``row_number`` with a total ``(ts, event_id)`` order
    — deterministic even with duplicate timestamps), full-outer-merged
    into the supplier dimension, and classified insert / update / keep.
    Balance totals go through the exact-decimal accumulator
    (:func:`khose_spark.sqlutil.dec_sum`) so the audit sums are
    bit-stable.  Full outer cannot broadcast; both sides shuffle on the
    merge key — at 100 TB the base would be bucketed on the key so only
    the change feed (≪ base) moves."""
    ev = t(spark, sf_dir, "events")
    sup = t(spark, sf_dir, "supplier")

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    latest = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("value").alias("new_bal"))
    )
    merged = sup.join(latest, sup.s_suppkey == latest.user_id, "full_outer")
    classified = merged.select(
        F.coalesce("s_suppkey", "user_id").alias("key"),
        F.when(
            F.col("s_suppkey").isNotNull() & F.col("user_id").isNotNull(),
            "update",
        )
        .when(F.col("s_suppkey").isNull(), "insert")
        .otherwise("keep")
        .alias("action"),
        F.coalesce("new_bal", "s_acctbal").alias("balance"),
    )
    return classified.groupBy("action").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("key").cast("long").alias("min_key"),
        F.max("key").cast("long").alias("max_key"),
        dec_sum(F.col("balance"), 2).alias("sum_balance"),
    )


# Full FK graph of the TPC-H-ish fixture schema: every child→parent
# edge a referential-integrity audit should certify before a publish.
_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
]


def _ri_branch_sql(child: str, fk: str, parent: str, pk: str) -> str:
    return f"""
      SELECT '{child}.{fk}->{parent}.{pk}' AS fk_edge,
             count(*) AS n_child,
             CAST(sum(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_orphan
      FROM {child} c
      LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p
        ON c.{fk} = p.{pk}"""


@query(
    "q_dq_referential",
    oracle=f"""
    WITH edges AS (
      {" UNION ALL ".join(_ri_branch_sql(*e) for e in _FK_EDGES)}
    )
    SELECT fk_edge, n_child, n_orphan,
           (2 * 1000 * (n_child - n_orphan) + n_child)
             // (2 * n_child) AS coverage_permille
    FROM edges ORDER BY fk_edge
    """,
)
def q_dq_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit of the full FK graph: for each of
    the five child->parent edges, how many child rows exist, how many
    are orphans (FK value absent from the parent), and the half-up
    permille coverage — the one-page "is the snapshot internally
    consistent" report, generalizing the single orphan rule inside
    q_dq_expectations to every edge.

    Scale shape: each edge first collapses the child to distinct FK
    values with counts (one key shuffle, map-side combined), so the
    membership join carries |distinct keys| rows, not |child| rows;
    parent sides join as distinct-key projections (AQE broadcasts the
    small ones). Orphan rows are summed from the pre-aggregated counts
    — the child fact is scanned once per edge and never re-shuffled."""
    dfs = []
    for child, fk, parent, pk in _FK_EDGES:
        grouped = (
            t(spark, sf_dir, child)
            .groupBy(F.col(fk).alias("fk_val"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        parent_keys = (
            t(spark, sf_dir, parent)
            .select(F.col(pk).alias("pk_val"))
            .distinct()
        )
        joined = grouped.join(
            parent_keys, grouped.fk_val == parent_keys.pk_val, "left_outer"
        )
        dfs.append(
            joined.agg(
                F.lit(f"{child}.{fk}->{parent}.{pk}").alias("fk_edge"),
                F.sum("cnt").alias("n_child"),
                F.coalesce(
                    F.sum(
                        F.when(F.col("pk_val").isNull(), F.col("cnt"))
                        .otherwise(0)
                    ),
                    F.lit(0),
                ).alias("n_orphan"),
            )
        )
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionAll(df)
    return out.select(
        "fk_edge",
        "n_child",
        "n_orphan",
        F.expr(
            "(2 * 1000 * (n_child - n_orphan) + n_child)"
            " DIV (2 * n_child)"
        ).alias("coverage_permille"),
    ).orderBy("fk_edge")


@query(
    "q_dq_freshness",
    oracle="""
    WITH per_type AS (
      SELECT event_type, count(*) AS n_events,
             CAST(floor(epoch(max(ts))) AS BIGINT) AS max_epoch_s
      FROM events GROUP BY event_type
    )
    SELECT event_type, n_events,
           CAST(max(max_epoch_s) OVER () - max_epoch_s AS BIGINT)
             // 60 AS minutes_behind,
           (CAST(max(max_epoch_s) OVER () - max_epoch_s AS BIGINT)
             // 60) > 1440 AS stale_1d
    FROM per_type ORDER BY event_type
    """,
)
def q_dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream freshness audit: each event type's row count, its lag
    in whole minutes behind the newest event anywhere in the table, and
    a stale flag at the 1-day SLA — the "is any upstream producer
    silently stuck" monitor a streaming ingest pipeline runs on every
    snapshot.

    Exact by construction: unix_timestamp floors to whole seconds (the
    q_fn_ts law, oracle mirrors with floor(epoch())), the lag divides
    truncation-consistently in both engines (non-negative by
    construction), and no floats appear. Plan: one map-side partial max
    per type, a 5-row aggregate, and a window over those 5 rows — the
    scan is the only data-sized stage at any scale."""
    per_type = (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_timestamp(F.max("ts")).alias("max_epoch_s"),
        )
    )
    w_all = Window.orderBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    lag_min = F.expr("(global_max - max_epoch_s) DIV 60")
    return (
        per_type.withColumn(
            "global_max", F.max("max_epoch_s").over(w_all)
        )
        .select(
            "event_type",
            "n_events",
            lag_min.alias("minutes_behind"),
            (lag_min > 1440).alias("stale_1d"),
        )
        .orderBy("event_type")
    )


# Primary-key contracts of the fixture tables (composite for lineitem).
_PK_TABLES = [
    ("orders", ["o_orderkey"]),
    ("customer", ["c_custkey"]),
    ("part", ["p_partkey"]),
    ("supplier", ["s_suppkey"]),
    ("lineitem", ["l_orderkey", "l_linenumber"]),
    ("events", ["event_id"]),
    ("documents", ["doc_id"]),
]


def _pk_branch_sql(table: str, pk: list[str]) -> str:
    key = ", ".join(pk)
    return f"""
      SELECT '{table}({key})' AS pk, count(*) AS n_keys,
             CAST(sum(c) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dup_keys,
             CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
                 AS n_dup_rows
      FROM (SELECT count(*) AS c FROM {table} GROUP BY {key})"""


@query(
    "q_dq_pk_uniqueness",
    oracle=f"""
    SELECT * FROM ({" UNION ALL ".join(
        _pk_branch_sql(tbl, pk) for tbl, pk in _PK_TABLES)})
    ORDER BY pk
    """,
)
def q_dq_pk_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit across the seven keyed fixture
    tables (composite (l_orderkey, l_linenumber) for lineitem): per
    declared PK, the distinct key count, total rows, and how many
    keys/rows violate uniqueness — the other half of the publish gate
    next to q_dq_referential (FKs resolve AND keys are unique).

    Plan: one key-shuffled partial-count aggregate per table (map-side
    combined), folded to a single row each and unioned — seven
    independent linear passes, no joins at all. At 100 TB each branch
    is exactly the q_llm_exact_dedup shuffle shape on its own key."""
    dfs = []
    for table, pk in _PK_TABLES:
        per_key = (
            t(spark, sf_dir, table)
            .groupBy(*pk)
            .agg(F.count(F.lit(1)).alias("c"))
        )
        dfs.append(
            per_key.agg(
                F.lit(f"{table}({', '.join(pk)})").alias("pk"),
                F.count(F.lit(1)).alias("n_keys"),
                F.sum("c").alias("n_rows"),
                F.sum(
                    F.when(F.col("c") > 1, 1).otherwise(0)
                ).alias("n_dup_keys"),
                F.sum(
                    F.when(F.col("c") > 1, F.col("c")).otherwise(0)
                ).alias("n_dup_rows"),
            )
        )
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionAll(df)
    return out.orderBy("pk")


@query(
    "q_dq_sequence_gaps",
    oracle="""
    WITH keys AS (
      SELECT DISTINCT o_orderkey AS k FROM orders
      WHERE o_orderstatus = 'O'
    ), bounds AS (
      SELECT CAST(min(k) AS BIGINT) AS kmin,
             CAST(max(k) AS BIGINT) AS kmax,
             CAST(count(*) AS BIGINT) AS n
      FROM keys
    ), gap_starts AS (
      SELECT a.k
      FROM keys a CROSS JOIN bounds b
      WHERE a.k < b.kmax
        AND NOT EXISTS (SELECT 1 FROM keys x WHERE x.k = a.k + 1)
    )
    SELECT b.n AS n_keys,
           b.kmax - b.kmin + 1 AS key_span,
           b.kmax - b.kmin + 1 - b.n AS n_missing,
           CAST(count(g.k) AS BIGINT) AS n_gaps,
           CAST(min(g.k) + 1 AS BIGINT) AS first_gap_at,
           CAST(max(g.k) + 1 AS BIGINT) AS last_gap_at
    FROM gap_starts g CROSS JOIN bounds b
    GROUP BY b.n, b.kmax, b.kmin
    """,
)
def q_dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands audit over the orderkey ID space WITHOUT the
    textbook global window — the data-quality check behind "did the
    upstream extractor drop a range?".  The classic
    row_number-minus-key trick needs a GLOBAL ordered window
    (single-partition, 100 TB-fatal); this registers the distributed
    form: a gap STARTS at key k iff k+1 is absent and k < max, which
    is one hash-partitioned self-anti-join on k+1 — the same shuffle
    shape as any equi-join, no ordering anywhere.  Gap COUNT and
    missing MASS then fold in closed form (span − present), so the
    answer needs no per-gap enumeration; first/last gap positions
    come free from the anti-join output.

    The audited key space is the open-order ('O') subset — the slice
    an extractor re-pulls incrementally, and (unlike the dense full
    orderkey space, which has zero gaps in the fixture) one whose gap
    path actually executes: the fixture yields thousands of gaps, so
    the hash check certifies the gap arithmetic, not a vacuous empty
    relation.

    Exactness: pure int64 key arithmetic end to end.

    Plan: one distinct on the key (fact-sized, map-side combined),
    one self-anti-join on k+1 (hash equi-join, broadcast 1-row
    bounds), one 1-row fold.  At 100 TB: two key-keyed shuffles,
    zero windows, zero sorts."""
    keys = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    bounds = keys.agg(
        F.min("k").cast("long").alias("kmin"),
        F.max("k").cast("long").alias("kmax"),
        F.count(F.lit(1)).alias("n"),
    )
    shifted = keys.select((F.col("k") - 1).alias("k"))
    gap_starts = (
        keys.join(shifted, "k", "left_anti")
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("k") < F.col("kmax"))
    )
    return gap_starts.groupBy("n", "kmax", "kmin").agg(
        F.count("k").alias("n_gaps"),
        (F.min("k") + 1).cast("long").alias("first_gap_at"),
        (F.max("k") + 1).cast("long").alias("last_gap_at"),
    ).select(
        F.col("n").alias("n_keys"),
        (F.col("kmax") - F.col("kmin") + 1).alias("key_span"),
        (F.col("kmax") - F.col("kmin") + 1 - F.col("n")).alias(
            "n_missing"
        ),
        "n_gaps",
        "first_gap_at",
        "last_gap_at",
    )


@query(
    "q_dq_reconciliation",
    oracle="""
    WITH line_tot AS (
      SELECT l_orderkey AS k,
             sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                      AS DECIMAL(28,6))) AS charge
      FROM lineitem GROUP BY 1
    ), joined AS (
      SELECT o.o_orderkey,
             CAST(o.o_totalprice AS DECIMAL(18,2)) AS booked,
             lt.charge,
             abs(lt.charge - CAST(o.o_totalprice AS DECIMAL(18,2)))
               AS adiff
      FROM orders o LEFT JOIN line_tot lt ON lt.k = o.o_orderkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN charge IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_no_lines,
           CAST(sum(CASE WHEN adiff = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact,
           CAST(sum(CASE WHEN adiff <= 0.005 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_match_2dp,
           CAST(sum(CASE WHEN adiff * 100 <= booked THEN 1 ELSE 0 END)
                AS BIGINT) AS n_within_1pct,
           CAST(round(max(adiff), 2) AS DOUBLE) AS max_diff,
           CAST(round(sum(adiff), 2) AS DOUBLE) AS total_abs_diff
    FROM joined
    """,
)
def q_dq_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table financial reconciliation -- the ledger-vs-detail
    audit every warehouse runs before trusting a fact table: does each
    order's booked total equal the sum of its line charges
    (extendedprice * (1-disc) * (1+tax))? Reports orphan orders (no
    lines), exact matches, 2-dp matches, within-1% matches, and the
    worst/total absolute drift.

    Exactness: line charges fold as DECIMAL(28,6) (exact int128
    accumulation, order-insensitive -- the sqlutil money law), the
    booked side is the exact DECIMAL(18,2) cast, and every comparison
    (= 0, <= 0.005, diff*100 <= booked) is pure decimal arithmetic
    with no rounding before the predicate; the two reported magnitudes
    round once at the boundary.

    Plan: one orderkey-keyed line aggregate (map-side combined) + one
    equi-join against orders + a 1-row fold. At 100 TB: two orderkey
    shuffles -- the canonical co-partitioned fact-to-fact shape
    (bucketed tables make it zero-shuffle, q_sink_bucketed_join)."""
    li = t(spark, sf_dir, "lineitem")
    line_tot = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.sum(
            (
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).cast("decimal(28,6)")
        ).alias("charge")
    )
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("booked"),
    )
    joined = o.join(
        line_tot, o.o_orderkey == line_tot.k, "left"
    ).select(
        "booked",
        "charge",
        F.abs(F.col("charge") - F.col("booked")).alias("adiff"),
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("charge").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_no_lines"),
        F.sum(F.when(F.col("adiff") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_exact"),
        F.sum(F.when(F.col("adiff") <= 0.005, 1).otherwise(0))
        .cast("long")
        .alias("n_match_2dp"),
        F.sum(
            F.when(F.col("adiff") * 100 <= F.col("booked"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_within_1pct"),
        F.round(F.max("adiff"), 2).cast("double").alias("max_diff"),
        F.round(F.sum("adiff"), 2).cast("double").alias("total_abs_diff"),
    )


# Candidate functional dependencies audited by q_dq_functional_dep:
# (label, table, lhs, rhs) — one holding by construction (nation's
# region assignment) and two expected to fail with measurable g3 mass.
_FD_CANDIDATES = (
    ("nation.n_nationkey->n_regionkey", "nation", "n_nationkey",
     "n_regionkey"),
    ("orders.o_custkey->o_orderstatus", "orders", "o_custkey",
     "o_orderstatus"),
    ("orders.o_custkey->o_orderpriority", "orders", "o_custkey",
     "o_orderpriority"),
)


def _fd_oracle() -> str:
    parts = []
    for label, table, lhs, rhs in _FD_CANDIDATES:
        parts.append(f"""
    SELECT '{label}' AS fd,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_lhs,
           CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_lhs,
           CAST(sum(cnt) - sum(mx) AS BIGINT) AS violation_mass,
           CAST((2 * 1000 * (sum(cnt) - sum(mx)) + sum(cnt))
                // (2 * sum(cnt)) AS BIGINT) AS g3_permille
    FROM (
      SELECT {lhs} AS l, count(*) AS n_rhs,
             sum(c) AS cnt, max(c) AS mx
      FROM (
        SELECT {lhs}, {rhs}, count(*) AS c
        FROM {table} WHERE {lhs} IS NOT NULL
        GROUP BY 1, 2
      ) GROUP BY 1
    )""")
    return " UNION ALL ".join(parts)


@query("q_dq_functional_dep", oracle=_fd_oracle())
def q_dq_functional_dep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency violation audit — the profiling step that
    decides whether a column pair can be normalized into a dimension /
    used as a merge key: for each candidate FD X → Y, report the
    distinct-LHS count, how many LHS values map to >1 RHS value, and
    the **g3 error** (minimum rows to delete to make the FD hold =
    n − Σ_x max_y count(x,y)) as a half-up integer permille — the
    standard approximate-FD measure, so "holds", "holds with 0.3%
    dirt", and "does not hold" are one hash-checked relation.
    Candidates cover one true FD (nation → region) and two
    deliberately-false ones (customer → order status / priority), so
    both branches of the audit execute at every SF.

    Plan: per FD, one (lhs, rhs) count aggregate (map-side combined —
    the only fact-sized shuffle), one lhs-keyed re-fold of that
    bounded relation, one 1-row summary; the three FD relations union.
    At 100 TB each FD costs exactly one shuffle keyed on its LHS,
    all-integer arithmetic end to end."""
    outs = []
    for label, table, lhs, rhs in _FD_CANDIDATES:
        pairs = (
            t(spark, sf_dir, table)
            .filter(F.col(lhs).isNotNull())
            .groupBy(F.col(lhs).alias("l"), F.col(rhs).alias("r"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        per_lhs = pairs.groupBy("l").agg(
            F.count(F.lit(1)).alias("n_rhs"),
            F.sum("c").alias("cnt"),
            F.max("c").alias("mx"),
        )
        outs.append(
            per_lhs.agg(
                F.lit(label).alias("fd"),
                F.sum("cnt").cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_lhs"),
                F.sum((F.col("n_rhs") > 1).cast("long"))
                .cast("long")
                .alias("n_violating_lhs"),
                (F.sum("cnt") - F.sum("mx"))
                .cast("long")
                .alias("violation_mass"),
                F.expr(
                    "CAST((2 * 1000 * (sum(cnt) - sum(mx)) + sum(cnt))"
                    " DIV (2 * sum(cnt)) AS BIGINT)"
                ).alias("g3_permille"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@query(
    "q_dq_temporal_fk",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CASE WHEN l.l_shipdate < o.o_orderdate
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_before_order,
           CAST(sum(CASE WHEN CAST(l.l_shipdate AS DATE)
                         - CAST(o.o_orderdate AS DATE) > 90
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_sla_breach,
           CAST((2 * 1000 * sum(CASE WHEN l.l_shipdate < o.o_orderdate
                                THEN 1 ELSE 0 END) + count(*))
                // (2 * count(*)) AS BIGINT) AS viol_permille,
           CAST(min(CAST(l.l_shipdate AS DATE)
                    - CAST(o.o_orderdate AS DATE)) AS BIGINT)
               AS min_lead_days,
           CAST(max(CAST(l.l_shipdate AS DATE)
                    - CAST(o.o_orderdate AS DATE)) AS BIGINT)
               AS max_lead_days
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1 ORDER BY 1
    """,
)
def q_dq_temporal_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal referential-integrity audit across the FK join - the
    cross-TABLE data-quality member (q_dq_referential checks the keys
    EXIST; this checks the DATES make causal sense): a lineitem
    shipped before its order was placed is a pipeline bug (clock skew,
    backdated loads, join corruption), and one shipped more than 90
    days after is an SLA breach. Per order priority: exact violation
    counts, half-up violation permille, and the min/max lead-day
    envelope - the dashboard that catches a bad backfill the day it
    lands.

    Determinism/exactness: all-integer - date subtraction in days,
    counts, exact half-up permille; no floats anywhere.

    Plan: one orderkey-keyed join (co-partitioned fact-to-fact - the
    natural bucketing key both tables share; AQE picks shuffle-hash
    at fixture scale, a bucketed sort-merge at 100 TB) + a 5-row
    priority aggregate with map-side combine."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    lead = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    viol = F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0)
    return (
        j.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(viol).cast("long").alias("n_before_order"),
            F.sum(F.when(lead > 90, 1).otherwise(0))
            .cast("long")
            .alias("n_sla_breach"),
            F.expr(
                "CAST((2 * 1000 * sum(CASE WHEN l_shipdate < o_orderdate"
                " THEN 1 ELSE 0 END) + count(*)) DIV (2 * count(*))"
                " AS BIGINT)"
            ).alias("viol_permille"),
            F.min(lead).cast("long").alias("min_lead_days"),
            F.max(lead).cast("long").alias("max_lead_days"),
        )
        .orderBy("priority")
    )
