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


# ---------------------------------------------------------------------------
# Round-5c idiom references: the new statistical operators' integer
# formulations checked against independent pure-Python references.


@given(
    xs=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60
    )
)
@settings(deadline=None, max_examples=200)
def test_gini_rank_formula_matches_pairwise_definition(xs):
    """q_agg_gini's rank formulation G = (2Σi·x − (n+1)Σx)/(nΣx) must
    equal the textbook mean-absolute-difference definition
    G = ΣΣ|x_i − x_j| / (2n²μ) — verified in exact Fractions, then the
    half-up permille idiom against decimal ROUND_HALF_UP."""
    from decimal import ROUND_HALF_UP, Decimal
    from fractions import Fraction

    sx = sum(xs)
    if sx == 0:
        return  # undefined (division by zero) — operator domain excludes it
    n = len(xs)
    srt = sorted(xs)
    num = 2 * sum((i + 1) * x for i, x in enumerate(srt)) - (n + 1) * sx
    rank_g = Fraction(num, n * sx)
    mad = sum(abs(a - b) for a in xs for b in xs)
    pair_g = Fraction(mad, 2 * n * sx)
    assert rank_g == pair_g
    # the half-up integer division used in both engines
    idiom = (2 * 1000 * num + n * sx) // (2 * n * sx)
    ref = int(
        (Decimal(num * 1000) / Decimal(n * sx)).quantize(
            Decimal("1"), rounding=ROUND_HALF_UP
        )
    )
    assert idiom == ref


def test_dp_ladder_is_exact_twosided_geometric():
    """q_priv_dp_histogram's integer inverse-CDF ladder: masses must be
    symmetric, halve per step (alpha = 1/2), cover [0, M) exhaustively,
    and leave exactly the documented 2048/M residual on zero."""
    from khose_spark.operators.governance import _DP_M, _dp_ladder

    ladder = _dp_ladder()
    bounds = [hi for hi, _ in ladder]
    assert bounds == sorted(bounds)  # CASE ladder is a proper CDF
    masses: dict[int, int] = {}
    prev = 0
    for hi, noise in ladder:
        masses[noise] = masses.get(noise, 0) + (hi - prev)
        prev = hi
    residual = _DP_M - prev
    assert residual == 2048  # documented truncation mass -> noise 0
    assert masses[0] == 2**20
    for k in range(1, 11):
        assert masses[k] == masses[-k] == (2**20) // (2**k)


@given(a=st.integers(min_value=-(10**15), max_value=10**15))
@settings(deadline=None, max_examples=200)
def test_holt_truncdiv_matches_duckdb_integer_division(a):
    """q_ts_holt_forecast's explicit trunc-toward-zero halving must equal
    DuckDB's // on the same operand (Python // floors, which differs on
    negative odd numbers — the exact bug the helper exists to avoid)."""
    import duckdb

    tdiv2 = a // 2 if a >= 0 else -((-a) // 2)
    assert tdiv2 == duckdb.sql(f"SELECT CAST({a} AS BIGINT) // 2").fetchone()[0]


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),  # band
            st.booleans(),  # positive label
        ),
        min_size=2,
        max_size=80,
    )
)
@settings(deadline=None, max_examples=200)
def test_decision_stump_cumulative_formula_matches_brute_force(rows):
    """q_ml_decision_stump's cumulative-window accuracy must equal a
    brute-force rescan per threshold (majority class on each side)."""
    bands = sorted({b for b, _ in rows})
    if len(bands) < 2:
        return  # no non-degenerate split exists
    # brute force: for split 'band <= t' (t = all but the last band)
    best_bf = -1
    for tband in bands[:-1]:
        left = [p for b, p in rows if b <= tband]
        right = [p for b, p in rows if b > tband]
        correct = max(sum(left), len(left) - sum(left)) + max(
            sum(right), len(right) - sum(right)
        )
        best_bf = max(best_bf, correct)
    # cumulative formulation (the operator's shape)
    from collections import Counter

    per_band = Counter()
    per_band_pos = Counter()
    for b, p in rows:
        per_band[b] += 1
        per_band_pos[b] += int(p)
    n_total = len(rows)
    pos_total = sum(per_band_pos.values())
    n_left = pos_left = 0
    best_cum = -1
    for b in bands:
        n_left += per_band[b]
        pos_left += per_band_pos[b]
        if n_left == n_total:
            continue
        correct = max(pos_left, n_left - pos_left) + max(
            pos_total - pos_left, (n_total - n_left) - (pos_total - pos_left)
        )
        best_cum = max(best_cum, correct)
    assert best_cum == best_bf


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),   # score band
            st.booleans(),                           # positive label
        ),
        min_size=2,
        max_size=60,
    )
)
@settings(deadline=None, max_examples=200)
def test_auc_banded_fold_matches_pairwise_definition(rows):
    """q_ml_auc's per-band fold Σ pos_b·(2·neg_below + neg_b) must equal
    the doubled Mann-Whitney pair count 2·(#pos>neg) + #ties computed
    brute-force over all (pos, neg) pairs."""
    pos = [b for b, p in rows if p]
    neg = [b for b, p in rows if not p]
    if not pos or not neg:
        return  # AUC undefined without both classes
    brute2 = sum(
        2 if bp > bn else (1 if bp == bn else 0)
        for bp in pos
        for bn in neg
    )
    from collections import Counter

    pos_c, neg_c = Counter(pos), Counter(neg)
    fold2 = 0
    neg_below = 0
    for band in sorted(set(pos_c) | set(neg_c)):
        fold2 += pos_c[band] * (2 * neg_below + neg_c[band])
        neg_below += neg_c[band]
    assert fold2 == brute2


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # group id
            st.integers(min_value=0, max_value=4),   # sensitive value
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(deadline=None, max_examples=200)
def test_tcloseness_common_denominator_matches_fractions(rows):
    """q_priv_tcloseness's integer numerator Σ_s |c_gs·n − c_s·n_g| over
    denominator 2·n_g·n must equal the fraction-space TVD
    1/2 Σ_s |c_gs/n_g − c_s/n| exactly (checked via fractions)."""
    from collections import Counter
    from fractions import Fraction

    n = len(rows)
    c_s = Counter(s for _, s in rows)
    for g in {g for g, _ in rows}:
        cell = Counter(s for gg, s in rows if gg == g)
        n_g = sum(cell.values())
        sens_domain = set(c_s) | set(cell)
        tvd_frac = (
            Fraction(1, 2)
            * sum(
                abs(
                    Fraction(cell[s], n_g) - Fraction(c_s[s], n)
                )
                for s in sens_domain
            )
        )
        num = sum(
            abs(cell[s] * n - c_s[s] * n_g) for s in sens_domain
        )
        assert Fraction(num, 2 * n_g * n) == tvd_frac


@given(
    st.lists(st.integers(min_value=0, max_value=10), min_size=1, max_size=40),
    st.lists(st.integers(min_value=0, max_value=10), min_size=1, max_size=40),
)
@settings(deadline=None, max_examples=200)
def test_ks_scaled_sup_matches_ecdf_definition(xs, ys):
    """q_ml_ks_test's integer sup max|cum1·n2 − cum2·n1| over n1·n2 must
    equal the ECDF-space KS distance sup|F1(t) − F2(t)| (fractions)."""
    from fractions import Fraction

    n1, n2 = len(xs), len(ys)
    points = sorted(set(xs) | set(ys))
    ks_frac = max(
        abs(
            Fraction(sum(1 for x in xs if x <= t), n1)
            - Fraction(sum(1 for y in ys if y <= t), n2)
        )
        for t in points
    )
    scaled = max(
        abs(
            sum(1 for x in xs if x <= t) * n2
            - sum(1 for y in ys if y <= t) * n1
        )
        for t in points
    )
    assert Fraction(scaled, n1 * n2) == ks_frac


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5000),  # epoch second
            st.integers(min_value=0, max_value=99),    # event id
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda r: r[1],
    )
)
@settings(deadline=None, max_examples=200)
def test_sessionize_is_tie_order_invariant(rows):
    """q_ts_sessionize's session partition must be identical no matter
    how timestamp-tied rows arrive: both the new-session flag and the
    id-cumsum ride the (es, event_id) total order, so any input
    permutation yields the same multiset of session sizes."""
    GAP = 1800

    def sessions(order):
        order = sorted(order, key=lambda r: (r[0], r[1]))
        sizes, cur = [], 0
        prev = None
        for es, _eid in order:
            if prev is None or es - prev > GAP:
                if cur:
                    sizes.append(cur)
                cur = 0
            cur += 1
            prev = es
        sizes.append(cur)
        return sorted(sizes)

    base = sessions(rows)
    assert sessions(list(reversed(rows))) == base
    # rotate to exercise a third arrival order
    assert sessions(rows[1:] + rows[:1]) == base


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # day index
            st.integers(min_value=0, max_value=9),   # user id
        ),
        min_size=1,
        max_size=80,
    )
)
@settings(deadline=None, max_examples=200)
def test_rolling_wau_explode_equals_window_definition(rows):
    """q_ts_rolling_wau's explode-to-anchor shape must equal the direct
    definition: distinct users active in [d-6, d] for every observed
    day d past the warm-up."""
    pairs = {(d, u) for d, u in rows}
    days = sorted({d for d, _ in pairs})
    d0 = days[0]
    direct = {
        d: len({u for (dd, u) in pairs if d - 6 <= dd <= d})
        for d in days
        if d >= d0 + 6
    }
    # explode formulation
    from collections import defaultdict

    anchors = defaultdict(set)
    for d, u in pairs:
        for off in range(7):
            anchors[d + off].add(u)
    exploded = {
        d: len(anchors[d]) for d in days if d >= d0 + 6
    }
    assert exploded == direct


@given(
    st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=30),
    st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=30),
    st.integers(min_value=1, max_value=10),
)
@settings(deadline=None, max_examples=200)
def test_bucketed_range_join_rewrite_is_lossless(xs, ys, win):
    """q_join_range_bucketed's claim: |x − y| <= win implies the
    win-sized buckets of x and y differ by at most 1, so exploding one
    side to bucket±1 and equi-joining loses no pair (and the exact
    predicate then removes any extras)."""
    direct = {
        (i, j)
        for i, x in enumerate(xs)
        for j, y in enumerate(ys)
        if abs(x - y) <= win
    }
    bucketed = set()
    for i, x in enumerate(xs):
        for off in (-1, 0, 1):
            bx = x // win + off
            for j, y in enumerate(ys):
                if y // win == bx and abs(x - y) <= win:
                    bucketed.add((i, j))
    assert bucketed == direct
