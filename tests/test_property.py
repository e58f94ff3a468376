"""Property-based Spark↔DuckDB agreement (SURVEY.md §5.2 item 4).

For randomly generated small frames, the SAME ANSI-SQL text must produce
the same result in Spark SQL and DuckDB — a generative extension of the
oracle harness: instead of one fixture, hypothesis searches the input
space (nulls, duplicate keys, empty groups, negative values) for
disagreements in the shared SQL subset the engine relies on.

Floats are generated as multiples of 0.25, which are exactly
representable in binary — sums are then exact in both engines, so no
rounding tolerance can mask (or cause) a real semantic difference.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests._parity import compare

KEYS = ["a", "b", "c", None]

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-1000, max_value=1000),
        st.sampled_from(KEYS),
        st.integers(min_value=-400, max_value=400).map(lambda n: n * 0.25),
    ),
    min_size=1,
    max_size=40,
)

# Shared-dialect queries: each string runs verbatim in BOTH engines.
SQL_PROPS = [
    "SELECT k, count(*) AS n, sum(v) AS s FROM prop_t GROUP BY k",
    "SELECT k, min(v) AS lo, max(v) AS hi, count(DISTINCT id) AS d FROM prop_t GROUP BY k",
    """SELECT t1.k AS k, count(*) AS n
       FROM prop_t t1 JOIN prop_t t2 ON t1.k = t2.k AND t1.id < t2.id
       GROUP BY t1.k""",
    "SELECT DISTINCT k FROM prop_t WHERE v > 0",
    """SELECT id, k, v, row_number() OVER (ORDER BY v, id) AS rn
       FROM prop_t WHERE k IS NOT NULL""",
    """SELECT k, sum(CASE WHEN v > 0 THEN v ELSE 0 END) AS pos_sum
       FROM prop_t GROUP BY k HAVING count(*) > 1""",
]


def _unique_ids(rows: list[tuple]) -> pd.DataFrame:
    # ids made unique so row_number tiebreaks are deterministic.
    return pd.DataFrame(
        [(i, k, v) for i, (_, k, v) in enumerate(rows)],
        columns=["id", "k", "v"],
    ).astype({"id": "int64", "v": "float64"})


@pytest.mark.parametrize("sql", SQL_PROPS)
@given(rows=rows_strategy)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_spark_duckdb_agree(spark, sql, rows):
    import duckdb

    pdf = _unique_ids(rows)
    spark.createDataFrame(pdf).createOrReplaceTempView("prop_t")
    spark_pdf = spark.sql(sql).toPandas()
    con = duckdb.connect()
    con.register("prop_t", pdf)
    oracle_pdf = con.sql(sql).df()
    con.close()
    problems = compare(spark_pdf, oracle_pdf)
    assert not problems, f"{sql}: " + "; ".join(problems)


# --- connected_components vs a pure-Python union-find oracle ---------------

edges_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {node: find(node) for node in parent}


@given(edges=edges_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_connected_components_matches_union_find(spark, edges):
    from khose_spark.operators.graph import connected_components

    pdf = pd.DataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], columns=["id_a", "id_b"]
    ).astype("int64")
    got = {
        r["node"]: r["rep"]
        for r in connected_components(spark.createDataFrame(pdf))
        .toPandas()
        .to_dict("records")
    }
    assert got == _union_find_components(edges)


# ---------------------------------------------------------------------------
# Half-up integer-permille idiom (used by q_ts_seasonality,
# q_llm_ngram_novelty, q_llm_winnowing, q_graph_supplier_similarity,
# q_llm_lsh_recall_audit, q_scan_key_skew ...): the claim is that
#   (2*k*1000 + d) DIV (2*d)  ==  round_half_up(k/d * 1000)
# for non-negative k <= d, d > 0, in BOTH engines' integer semantics.
# ---------------------------------------------------------------------------

from decimal import ROUND_HALF_UP, Decimal  # noqa: E402


@given(
    st.tuples(
        st.integers(min_value=0, max_value=10**12),
        st.integers(min_value=1, max_value=10**12),
    ).map(lambda t: (min(t[0], t[1]), max(t[0] or 1, t[1])))
)
@settings(max_examples=300, deadline=None)
def test_halfup_permille_identity(kd):
    k, d = kd
    want = int(
        (Decimal(k) * 1000 / Decimal(d)).quantize(
            Decimal("1"), rounding=ROUND_HALF_UP
        )
    )
    assert (2 * k * 1000 + d) // (2 * d) == want


def test_halfup_permille_cross_engine(spark, ddb):
    """The same DIV expression through Spark SQL and DuckDB on the
    boundary cases (exact halves, 0, d itself)."""
    rows = [(1, 2000), (1, 3), (999, 1000), (0, 7), (7, 7), (499, 998), (500, 1000)]
    import pandas as pd  # noqa: F811

    pdf = pd.DataFrame(rows, columns=["k", "d"])
    spark.createDataFrame(pdf).createOrReplaceTempView("halfup_t")
    ddb.register("halfup_t", pdf)
    q = "SELECT k, d, (2*k*1000 + d) {DIV} (2*d) AS p FROM halfup_t"
    got_spark = {
        (r.k, r.d): r.p
        for r in spark.sql(q.format(DIV="DIV")).collect()
    }
    got_duck = {
        (k, d): p for k, d, p in ddb.sql(q.format(DIV="//")).fetchall()
    }
    assert got_spark == got_duck
    assert got_spark[(1, 2000)] == 1  # exact half rounds UP
    assert got_spark[(500, 1000)] == 500


# ---------------------------------------------------------------------------
# Weighted-median crossing idiom (q_agg_weighted_percentile): the claim
# is that collapsing ties to (value, total_weight) rows first, then
# taking min(value where 2*cum_weight >= total) computes the classic
# lower weighted median — the smallest v with sum(w | value <= v) >=
# total/2 — for ANY multiset of (value, positive integer weight).
# ---------------------------------------------------------------------------

wm_rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50).map(lambda n: n * 0.25),
        st.integers(min_value=1, max_value=20),
    ),
    min_size=1,
    max_size=30,
)


def _lower_weighted_median(rows):
    total = sum(w for _, w in rows)
    cum = 0
    for v, w in sorted(rows):
        cum += w
        if 2 * cum >= total:
            return v
    raise AssertionError("unreachable")


@given(rows=wm_rows_strategy)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_weighted_median_crossing_idiom(spark, rows):
    pdf = pd.DataFrame(rows, columns=["v", "w"]).astype(
        {"v": "float64", "w": "int64"}
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("wm_t")
    got = spark.sql(
        """
        WITH by_v AS (
          SELECT v, sum(w) AS w FROM wm_t GROUP BY v
        ), cum AS (
          SELECT v,
                 sum(w) OVER (ORDER BY v) AS cum_w,
                 sum(w) OVER () AS total_w
          FROM by_v
        )
        SELECT min(CASE WHEN 2 * cum_w >= total_w THEN v END) AS m FROM cum
        """
    ).collect()[0].m
    assert got == _lower_weighted_median(rows)
