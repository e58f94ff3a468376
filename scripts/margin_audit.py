"""Executable overflow-margin audit (round 9, VERDICT r08 item 4).

Three consecutive decade jumps each caught exactly one latent int64
overflow that a DOCSTRING margin law had mispredicted or not covered
(spearman/gini/welch_t at 10×; q_ts_ar1 and q_llm_pmi at 100×). This
script turns those laws into measurements: for every key family whose
docstring declares a fixed-width-carrier law, it computes the ACTUAL
max |intermediate| on a materialization with one DuckDB aggregate per
law, and asserts at least ONE DECADE of headroom against the carrier —
so the next decade's overflow is flagged at THIS decade, before it
corrupts a result.

DuckDB-only by design: every audited intermediate is definable over
the raw parquet with the oracle dialect, so the audit needs no Spark
session and runs in seconds even on the 100× materialization.

Usage:
    python scripts/margin_audit.py                      # sf0.1 (1x)
    python scripts/margin_audit.py --dir=/path/to/dir   # any materialization
    python scripts/margin_audit.py --factor=10          # 10x dir (must exist
                                                        #  or be buildable via
                                                        #  the verify_sweep dirs)

Writes MARGIN_AUDIT.json at the repo root (keyed by audited dir) and
exits nonzero if any law has < 1 decade of headroom ("thin") or is
outright overflowed.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

INT64 = 9.223372036854776e18
DEC38 = 1e38
MIN_DECADES = 1.0  # required headroom: carrier / measured >= 10^1

# Shared CTE: exact (type, day) cents rollup + the u = n*x − S carrier
# used by the ljung_box/pacf2/dft exact-carrier family (r09).
_DAILY = """
    daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(sum(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS cents
      FROM events GROUP BY 1, 2
    ), st AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s
      FROM daily GROUP BY 1
    ), u AS (
      SELECT d.event_type,
             CAST(st.n * d.cents - st.s AS DOUBLE) AS u
      FROM daily d JOIN st ON st.event_type = d.event_type
    )
"""

# Each law: the docstring's carrier claim made executable. `sql` must
# return ONE row with one DOUBLE column `measured` = max |intermediate|.
from khose_spark.operators.graph import (  # noqa: E402 — law SQL prefix
    _BACKBONE_CTES,
)

LAWS: dict[str, dict] = {
    "modularity_numerator_decimal38": {
        "keys": ["q_graph_modularity"],
        "carrier": DEC38,
        "law": "per-community numerator products intra_dir·m2 and D_c²"
        " and the 2000·num permille fold all carry DECIMAL(38,0)/"
        "HUGEINT (widened AT REGISTRATION, r11): D_c² is supplier-"
        "count-quadratic and the permille product crosses int64 around"
        " 1e8 suppliers; measured = 2000·max(intra·m2, D_c²) + m2²,"
        " the largest value the fold forms",
        "sql": f"""
        WITH {_BACKBONE_CTES}, lab AS (
          SELECT s_suppkey AS node, CAST(s_nationkey AS BIGINT) AS com
          FROM supplier
        ), labeled AS (
          SELECT la.com AS ca, lb.com AS cb
          FROM adj JOIN lab la ON la.node = adj.node
                   JOIN lab lb ON lb.node = adj.nbr
        ), m2t AS (
          SELECT CAST(count(*) AS HUGEINT) AS m2 FROM labeled
        ), per_c AS (
          SELECT ca, CAST(count(*) AS HUGEINT) AS deg,
                 CAST(sum(CASE WHEN ca = cb THEN 1 ELSE 0 END)
                      AS HUGEINT) AS intra
          FROM labeled GROUP BY ca
        )
        SELECT 2 * 1000 * greatest(max(p.intra * t.m2),
                                   max(p.deg * p.deg))
               + t.m2 * t.m2 AS measured
        FROM per_c p CROSS JOIN m2t t GROUP BY t.m2
        """,
    },
    "granger_suffstats_decimal38": {
        "keys": ["q_ts_granger_lag1"],
        "carrier": DEC38,
        "law": "quadratic sufficient stats (Σv² etc.) fold in"
        " DECIMAL(38,0)/HUGEINT since r10 — the 10000× probe MEASURED"
        " max Σv² at 3.36e18, 0.44 decades inside int64 (7th"
        " consecutive decade catch); per-row v·v crosses int64 at"
        " ~100000×, so the widening is inside the product",
        "sql": """
        WITH ev AS (
          SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
          FROM events
        ), r AS (
          SELECT event_type, d,
                 CAST((sum(cents) - ((sum(cents) % 100) + 100) % 100)
                      // 100 AS BIGINT) AS v
          FROM ev GROUP BY 1, 2
        )
        SELECT max(s) AS measured FROM (
          SELECT event_type, sum(CAST(v AS DOUBLE) * v) AS s
          FROM r GROUP BY 1)
        """,
    },
    "acf_u_carrier_int64": {
        "keys": ["q_ts_ljung_box", "q_ts_pacf2", "q_ts_dft_power"],
        "carrier": INT64,
        "law": "u = n·x − S is exact int64; docstring: |u| ≈ 5e10 at"
        " 100×, 5e11 at 1000×",
        "sql": f"WITH {_DAILY} SELECT max(abs(u)) AS measured FROM u",
    },
    "acf_ssu_decimal38": {
        "keys": ["q_ts_ljung_box", "q_ts_pacf2", "q_ts_dft_power"],
        "carrier": DEC38,
        "law": "Σu² folds in DECIMAL(38,0); docstring: ≈2.5e23 per term"
        " ×720 at 1000×",
        "sql": f"""WITH {_DAILY}
        SELECT max(s) AS measured FROM (
          SELECT event_type, sum(u * u) AS s FROM u GROUP BY 1)
        """,
    },
    "dft_residue_bins_int64": {
        "keys": ["q_ts_dft_power"],
        "carrier": INT64,
        "law": "w_j = Σ_(i≡j mod 7) u_i exact int64; docstring ≈5e13 at"
        " 1000×",
        "sql": f"""WITH {_DAILY},
        idx AS (
          SELECT d.event_type,
                 (row_number() OVER (PARTITION BY d.event_type
                                     ORDER BY d.d) - 1) % 7 AS j,
                 CAST(st.n * d.cents - st.s AS DOUBLE) AS u
          FROM daily d JOIN st ON st.event_type = d.event_type
        )
        SELECT max(abs(w)) AS measured FROM (
          SELECT event_type, j, sum(u) AS w FROM idx GROUP BY 1, 2)
        """,
    },
    "ar1_cramer_decimal38": {
        "keys": ["q_ts_ar1"],
        "carrier": DEC38,
        "law": "n·Σx² (the DECIMAL(19,0) first-factor product that"
        " overflowed int64 at 100×: measured 9.3e19 r08)",
        "sql": f"""WITH {_DAILY}
        SELECT max(m) AS measured FROM (
          SELECT d.event_type,
                 max(st.n) * sum(CAST(d.cents AS DOUBLE) * d.cents) AS m
          FROM daily d JOIN st ON st.event_type = d.event_type
          GROUP BY 1)
        """,
    },
    "bollinger_quadform_decimal38": {
        "keys": ["q_ts_bollinger"],
        "carrier": DEC38,
        "law": "(7x−S)² and 4(7Q−S²) as DECIMAL(19,0)² → 38-digit"
        " products (int64 overflows at exactly the 100× decade)",
        "sql": f"""WITH {_DAILY},
        fr AS (
          SELECT event_type, cents,
                 sum(cents) OVER w AS sf,
                 sum(CAST(cents AS DOUBLE) * cents) OVER w AS qf,
                 count(*) OVER w AS m
          FROM daily
          WINDOW w AS (PARTITION BY event_type ORDER BY d
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        )
        SELECT max(greatest(
                 (7.0 * cents - sf) * (7.0 * cents - sf),
                 abs(4.0 * (7.0 * qf - CAST(sf AS DOUBLE) * sf))))
               AS measured
        FROM fr WHERE m = 7
        """,
    },
    "shapley_deviation_decimal38": {
        "keys": ["q_ml_shapley_2f"],
        "carrier": DEC38,
        "law": "Σ|n·x_j − s_j| folds in DECIMAL(38,0) (widened r10 —"
        " the int64 sum was the repo's thinnest law: measured 9.9e15"
        " at 100×, ×100/decade ⇒ ≈1e18 at 1000× vs int64's 9.2e18)",
        # MATERIALIZED + single-pass greatest: at the 1000× probe the
        # 150M-group feat CTE must not be recomputed per scalar
        # subquery (two extra passes spilled past the disk).
        "sql": """
        WITH feat AS MATERIALIZED (
          SELECT l_orderkey,
                 CAST(count(*) AS BIGINT) AS x1,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * 100 // 100)
                      AS BIGINT) AS x2
          FROM lineitem GROUP BY 1
        ), st AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x1) AS BIGINT) AS s1,
                 CAST(sum(x2) AS BIGINT) AS s2
          FROM feat
        )
        SELECT greatest(
                 sum(abs(CAST(st.n * f.x1 - st.s1 AS DOUBLE))),
                 sum(abs(CAST(st.n * f.x2 - st.s2 AS DOUBLE))))
               AS measured
        FROM feat f, st
        """,
    },
    "shapley_rowterm_int64": {
        "keys": ["q_ml_shapley_2f"],
        "carrier": INT64,
        "law": "per-row term n·x_j − s_j stays exact int64 (linear per"
        " decade: ≈6e9 at 100×, ≈6e11 at 1000× — the carrier the"
        " DECIMAL(38,0) sum fold consumes)",
        "sql": """
        WITH feat AS MATERIALIZED (
          SELECT l_orderkey,
                 CAST(count(*) AS BIGINT) AS x1,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * 100 // 100)
                      AS BIGINT) AS x2
          FROM lineitem GROUP BY 1
        ), st AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x1) AS BIGINT) AS s1,
                 CAST(sum(x2) AS BIGINT) AS s2
          FROM feat
        )
        SELECT greatest(
                 max(abs(CAST(st.n * f.x1 - st.s1 AS DOUBLE))),
                 max(abs(CAST(st.n * f.x2 - st.s2 AS DOUBLE))))
               AS measured
        FROM feat f, st
        """,
    },
    "target_encoding_sums_int64": {
        "keys": ["q_ml_target_encoding"],
        "carrier": INT64,
        "law": "per-category Σcents int64; docstring ≈6e13 at 100×,"
        " five digits of headroom at 1000×",
        "sql": """
        SELECT max(s) AS measured FROM (
          SELECT o_orderpriority,
                 sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS DOUBLE)) AS s
          FROM orders GROUP BY 1)
        """,
    },
    "ttest_paired_revcc_int64": {
        "keys": ["q_ml_ttest_paired"],
        "carrier": INT64,
        "law": "per-supplier-year Σrev_cc (centicents) int64",
        "sql": """
        SELECT max(s) AS measured FROM (
          SELECT l_suppkey,
                 CASE WHEN l_shipdate < TIMESTAMP '1996-01-01'
                      THEN 0 ELSE 1 END AS yr,
                 sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                          AS DOUBLE)
                     * (100 - round(CAST(l_discount AS DECIMAL(8,2))
                                    * 100, 0))) AS s
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1995-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY 1, 2)
        """,
    },
    "spearman_moments_decimal38": {
        "keys": ["q_agg_spearman"],
        "carrier": DEC38,
        "law": "centered rank scatter n·sxx − sx² ≈ 4n³ (1e18 at sf0.1"
        " — widened to DECIMAL(38)/HUGEINT in r05)",
        "sql": "SELECT 4.0 * pow(CAST(count(*) AS DOUBLE), 3)"
        " AS measured FROM lineitem",
    },
    "boost_weighted_err_decimal38": {
        "keys": ["q_ml_boosted_stumps"],
        "carrier": DEC38,
        "law": "largest permille term 1000·e2 ≤ 1000·w2 = 2000·e1·cw1"
        " ≤ 500·n² — folds in DECIMAL(38,0)/HUGEINT since r10: the"
        " 1000× lineitem probe measured the bound at 1.125e19 > int64"
        " (5th consecutive decade catch; r9's n³ catch was the same"
        " key's ensemble compare)",
        "sql": "SELECT 500.0 * pow(CAST(count(*) AS DOUBLE), 2)"
        " AS measured FROM orders",
    },
    "linreg_syy_decimal38": {
        "keys": ["q_ml_linreg_2f", "q_ml_ridge_2f"],
        "carrier": DEC38,
        "law": "Σy² (whole-dollar response squared) folds in"
        " DECIMAL(38,0) since r10 — the 1000× digest probe hit Spark's"
        " ANSI int64 overflow on the sum (6th consecutive decade"
        " catch); per-row y² ≈ 3.6e11 stays int64 at any decade",
        "sql": """
        SELECT sum(CAST(y AS DOUBLE) * y) AS measured FROM (
          SELECT CAST(round(CAST(o_totalprice AS DECIMAL(18,2)), 0)
                      AS BIGINT) AS y
          FROM orders)
        """,
    },
    "boost_round2_weight_decimal38": {
        "keys": ["q_ml_boosted_stumps"],
        "carrier": DEC38,
        "law": "round-2 total weight w2 = 2·e1·cw1 ≤ n²/2 folds in"
        " DECIMAL(38,0)/HUGEINT since r11 — widened while it still had"
        " 2.9 decades at 1000× (the documented next candidate, spent"
        " BEFORE the ladder caught it; 8th consecutive pre-production"
        " widening)",
        "sql": "SELECT 0.5 * pow(CAST(count(*) AS DOUBLE), 2)"
        " AS measured FROM orders",
    },
    "stl_quadsum_decimal38": {
        "keys": ["q_ts_stl_strength", "q_ts_spc_rules"],
        "carrier": DEC38,
        "law": "Σ(7x)² per type folds in DECIMAL(38,0) (the largest"
        " r09 quadratic carrier; same class as bollinger/ar1)",
        "sql": f"""WITH {_DAILY}
        SELECT max(s) AS measured FROM (
          SELECT event_type,
                 sum(49.0 * CAST(cents AS DOUBLE) * cents) AS s
          FROM daily GROUP BY 1)
        """,
    },
    "cm_inner_product_int64": {
        "keys": ["q_agg_cm_join_estimate"],
        "carrier": INT64,
        "law": "CM inner products fold Σ_b c(b)² ≤ n²/1024 (uniform"
        " bound; ≈3.4e12 measured at 100×)",
        "sql": "SELECT pow(CAST(count(*) AS DOUBLE), 2) / 1024.0"
        " AS measured FROM lineitem",
    },
    "pmi_ratio_double": {
        "keys": ["q_llm_pmi"],
        "carrier": 1.7e308,
        "law": "c_xy·N_u² folds as an ORDERED double ratio chain (the"
        " r08 overflow fix) — recorded so the magnitude stays visible",
        "sql": """
        WITH toks AS (
          SELECT unnest(string_split(text, ' ')) AS w FROM documents
        )
        SELECT pow(CAST(count(*) AS DOUBLE), 2) * 1000 AS measured
        FROM toks
        """,
    },
    "cuped_quadratic_decimal38": {
        "keys": ["q_ml_cuped", "q_ml_power_mde"],
        "carrier": DEC38,
        "law": "pooled CUPED fold products n·Sxx / n·Sxy / n·Syy over"
        " per-user pre/post cents carry DECIMAL(38,0)/HUGEINT (widened"
        " AT REGISTRATION, r11): per-user cents ~1e6 at 1× make the"
        " n-scaled quadratics ~1e16 and they gain TWO decades per data"
        " decade (users × per-user²), crossing int64 before 100×",
        "sql": """
        WITH pu AS (
          SELECT user_id,
                 CAST(coalesce(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                       THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END), 0)
                      AS BIGINT) AS x,
                 CAST(coalesce(sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                       THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END), 0)
                      AS BIGINT) AS y
          FROM events GROUP BY user_id
        ), g AS (
          SELECT CAST(count(*) AS HUGEINT) AS n,
                 sum(CAST(x AS HUGEINT) * x) AS sxx,
                 sum(CAST(x AS HUGEINT) * y) AS sxy,
                 sum(CAST(y AS HUGEINT) * y) AS syy
          FROM pu
        )
        SELECT CAST(n AS DOUBLE) * greatest(
                 CAST(sxx AS DOUBLE), CAST(sxy AS DOUBLE),
                 CAST(syy AS DOUBLE)) AS measured
        FROM g
        """,
    },
    "bh_fdr_pairdelta_decimal38": {
        "keys": ["q_ml_bh_fdr"],
        "carrier": DEC38,
        "law": "per-pair n·Sdd over daily-cents deltas carries"
        " DECIMAL(38,0)/HUGEINT (widened AT REGISTRATION, r11): daily"
        " cents scale linearly with the factor so d² is quadratic —"
        " ~1e20 at 3000×, two decades over int64",
        "sql": """
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d,
                 CAST(sum(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
                     AS cents
          FROM events GROUP BY 1, 2
        ), pairs AS (
          SELECT a.event_type AS ta, b.event_type AS tb,
                 CAST(count(*) AS HUGEINT) AS n,
                 sum(CAST(a.cents - b.cents AS HUGEINT)
                     * (a.cents - b.cents)) AS sdd
          FROM daily a JOIN daily b
            ON a.d = b.d AND a.event_type < b.event_type
          GROUP BY 1, 2
        )
        SELECT max(CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)) AS measured
        FROM pairs
        """,
    },
    "eventstudy_car_int64": {
        "keys": ["q_ts_event_study"],
        "carrier": INT64,
        "law": "car_scaled = n_pre·S_evt − n_evt·S_pre stays exact"
        " int64 (linear per decade: window sums are day-bounded so the"
        " product is ~15·5·daily-cents ~ 4e12 at 3000×, >6 decades"
        " spare); the second moment Σcents² rides the shared"
        " DECIMAL(38) daily-quadratic family",
        "sql": """
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d,
                 CAST(sum(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
                     AS cents
          FROM events
          WHERE CAST(ts AS DATE) < DATE '2024-01-16'
             OR (CAST(ts AS DATE) >= DATE '2024-01-18'
                 AND CAST(ts AS DATE) <= DATE '2024-01-22')
          GROUP BY 1, 2
        ), pt AS (
          SELECT event_type,
                 CAST(count(CASE WHEN d < DATE '2024-01-16' THEN 1 END)
                      AS HUGEINT) AS n_pre,
                 CAST(count(CASE WHEN d >= DATE '2024-01-18' THEN 1 END)
                      AS HUGEINT) AS n_evt,
                 CAST(coalesce(sum(CASE WHEN d < DATE '2024-01-16'
                                        THEN cents END), 0) AS HUGEINT)
                     AS s_pre,
                 CAST(coalesce(sum(CASE WHEN d >= DATE '2024-01-18'
                                        THEN cents END), 0) AS HUGEINT)
                     AS s_evt
          FROM daily GROUP BY event_type
        )
        SELECT max(abs(CAST(n_pre * s_evt - n_evt * s_pre AS DOUBLE)))
               AS measured
        FROM pt
        """,
    },
    "engle_granger_ols_decimal38": {
        "keys": ["q_ts_engle_granger"],
        "carrier": DEC38,
        "law": "OLS fold products n·Sxx / n·Sxy over the click/purchase"
        " daily pivot carry DECIMAL(38,0)/HUGEINT (widened AT"
        " REGISTRATION, r11); the RESIDUAL stage is double BY DESIGN —"
        " the integer carrier n·den·e_t would measure ~1e38 at the"
        " events-10000× decade, zero headroom, so no integer residual"
        " is ever materialized",
        "sql": """
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS d,
                 CAST(sum(CASE WHEN event_type = 'click'
                      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                      END) AS BIGINT) AS x,
                 CAST(sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                      END) AS BIGINT) AS y
          FROM events WHERE event_type IN ('click', 'purchase')
          GROUP BY 1
          HAVING count(CASE WHEN event_type = 'click' THEN 1 END) > 0
             AND count(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
        ), g AS (
          SELECT CAST(count(*) AS HUGEINT) AS n,
                 sum(CAST(x AS HUGEINT) * x) AS sxx,
                 sum(CAST(x AS HUGEINT) * y) AS sxy
          FROM daily
        )
        SELECT CAST(n AS DOUBLE)
               * greatest(CAST(sxx AS DOUBLE), CAST(sxy AS DOUBLE))
               AS measured
        FROM g
        """,
    },
    "ewma_carrier_decimal38": {
        "keys": ["q_ts_ewma_exact"],
        "carrier": DEC38,
        "law": "dyadic EWMA carrier E_T = Σ 2^(i-2)·cents_i folds in"
        " DECIMAL(38,0)/HUGEINT (widened AT REGISTRATION, r12): the"
        " 2^29 day-31 weight times ~5e8 daily cents is ~2.7e17 at"
        " sf0.1 and the carrier scales linearly with data volume —"
        " crosses int64 inside the events decade ladder; the 2000·E"
        " permille product in the output division is the largest"
        " value formed",
        "sql": """
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS d,
                 CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase' GROUP BY 1
        ), numbered AS (
          SELECT cents,
                 CAST(row_number() OVER (ORDER BY d) AS BIGINT)
                   AS day_no
          FROM daily
        )
        SELECT 2000.0 * sum(CAST(cents AS DOUBLE)
               * (CAST(1 AS BIGINT)
                  << CAST(greatest(day_no - 2, 0) AS INT)))
          AS measured
        FROM numbered
        """,
    },
    "levene_absdev_q_decimal38": {
        "keys": ["q_ml_levene_bf"],
        "carrier": DEC38,
        "law": "per-priority Σz² over |cents − group median| folds in"
        " DECIMAL(38,0)/HUGEINT (widened AT REGISTRATION, r12): z ≈"
        " 5e7 cents ⇒ z² ≈ 2.5e15 per row, crossing int64 at ~4e3"
        " rows/group — already past it at sf0.01",
        "sql": """
        WITH x AS (
          SELECT o_orderpriority AS grp,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS cents,
                 o_orderkey
          FROM orders
        ), ranked AS (
          SELECT grp, cents,
                 row_number() OVER (PARTITION BY grp
                                    ORDER BY cents, o_orderkey) AS rn,
                 count(*) OVER (PARTITION BY grp) AS n_g
          FROM x
        ), med AS (
          SELECT grp, cents AS m FROM ranked
          WHERE rn = (n_g + 1) // 2
        )
        SELECT max(q) AS measured FROM (
          SELECT x.grp,
                 sum(CAST(abs(x.cents - med.m) AS DOUBLE)
                     * abs(x.cents - med.m)) AS q
          FROM x JOIN med ON med.grp = x.grp GROUP BY 1)
        """,
    },
    "cochran_colsq_int64": {
        "keys": ["q_ml_cochran_q"],
        "carrier": INT64,
        "law": "3·ΣC_j² in the Q numerator stays exact int64: C_j ≤"
        " n_users (replication-invariant binary — the above-corpus-"
        "mean flag multiplies both cross-multiplication sides"
        " equally), so the term is ≤ 3·n_users² ≈ 7e12 at sf0.1 and"
        " users do NOT scale under events replication; measured ="
        " the numerator magnitude 2·|3ΣC² − N²|",
        "sql": """
        WITH cnt AS (
          SELECT user_id,
                 CAST(sum(CASE WHEN event_type = 'click' THEN 1
                      ELSE 0 END) AS BIGINT) AS nc,
                 CAST(sum(CASE WHEN event_type = 'view' THEN 1
                      ELSE 0 END) AS BIGINT) AS nv,
                 CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                      ELSE 0 END) AS BIGINT) AS np
          FROM events
          WHERE event_type IN ('click', 'view', 'purchase')
          GROUP BY user_id
        ), tots AS (
          SELECT CAST(count(*) AS BIGINT) AS nu,
                 CAST(sum(nc) AS BIGINT) AS tc,
                 CAST(sum(nv) AS BIGINT) AS tv,
                 CAST(sum(np) AS BIGINT) AS tp
          FROM cnt
        ), flags AS (
          SELECT CASE WHEN c.nc * t.nu > t.tc THEN 1 ELSE 0 END AS xc,
                 CASE WHEN c.nv * t.nu > t.tv THEN 1 ELSE 0 END AS xv,
                 CASE WHEN c.np * t.nu > t.tp THEN 1 ELSE 0 END AS xp
          FROM cnt c CROSS JOIN tots t
        )
        SELECT 2.0 * abs(3.0 * (sum(xc) * sum(xc) + sum(xv) * sum(xv)
                                + sum(xp) * sum(xp))
                         - (sum(xc + xv + xp))
                           * (sum(xc + xv + xp))) AS measured
        FROM flags
        """,
    },
    "gamma_pair_mass_decimal38": {
        "keys": ["q_ml_gamma_concordance"],
        "carrier": DEC38,
        "law": "concordant/discordant pair mass Σ n_a·n_b over the"
        " ≤50-cell contingency folds in DECIMAL(38,0) (widened AT"
        " REGISTRATION, r13): mass ~ n²/4 gains TWO decades per data"
        " decade and the per-pair product alone crosses int64 at ~3e9"
        " rows/cell; the reported int64 cast stays exact through"
        " ~4.3e9 orders rows — measured = max(conc, disc)",
        "sql": """
        WITH cell AS (
          SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS x,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) // 5000000 AS y,
                 CAST(count(*) AS BIGINT) AS n
          FROM orders GROUP BY 1, 2
        )
        SELECT greatest(
                 sum(CASE WHEN b.x > a.x AND b.y > a.y
                     THEN CAST(a.n AS DOUBLE) * b.n ELSE 0 END),
                 sum(CASE WHEN b.x > a.x AND b.y < a.y
                     THEN CAST(a.n AS DOUBLE) * b.n ELSE 0 END))
               AS measured
        FROM cell a CROSS JOIN cell b
        """,
    },
    "effect_sizes_q_decimal38": {
        "keys": ["q_ml_effect_sizes"],
        "carrier": DEC38,
        "law": "per-group Σcents² folds in DECIMAL(38,0) (widened AT"
        " REGISTRATION, r13 — the levene_bf precedent): cents² ≈"
        " 2.4e9 per row crosses int64 at ~4e9 rows/group, inside the"
        " events replication ladder; Σcents stays int64 (linear)",
        "sql": """
        SELECT max(q) AS measured FROM (
          SELECT event_type,
                 sum(CAST(cents AS DOUBLE) * cents) AS q
          FROM (
            SELECT event_type,
                   CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                     AS cents
            FROM events WHERE event_type IN ('click', 'view'))
          GROUP BY event_type)
        """,
    },
    "dunn_rank_carriers_decimal38": {
        "keys": ["q_ml_dunn_posthoc"],
        "carrier": DEC38,
        "law": "the two DECIMAL(38,0) midrank carriers (widened AT"
        " REGISTRATION, r13 — the kruskal_wallis/cochran precedent):"
        " per-group doubled-rank sum Σ c·mid2 ~ 2n²/5 (two decades"
        " per data decade) and band tie mass Σ(t³−t) with t ~ n/5000"
        " (THREE decades per data decade — ≈3.6e18, past int64, at"
        " orders-3000×); measured = max of the two",
        "sql": """
        WITH x AS (
          SELECT o_orderpriority AS grp,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) // 10000 AS band
          FROM orders
        ), joint AS (
          SELECT band, grp, CAST(count(*) AS BIGINT) AS c
          FROM x GROUP BY 1, 2
        ), marg AS (
          SELECT band, CAST(sum(c) AS BIGINT) AS t
          FROM joint GROUP BY band
        ), mid AS (
          SELECT band, t,
                 CAST(2 * coalesce(sum(t) OVER (ORDER BY band
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) + t + 1 AS BIGINT) AS mid2
          FROM marg
        ), g AS (
          SELECT j.grp, sum(CAST(j.c AS DOUBLE) * m.mid2) AS dr
          FROM joint j JOIN mid m ON m.band = j.band GROUP BY 1
        ), ties AS (
          SELECT sum(CAST(t AS DOUBLE) * t * t - t) AS t3t FROM marg
        )
        SELECT greatest((SELECT max(dr) FROM g),
                        (SELECT t3t FROM ties)) AS measured
        """,
    },
    "cliffs_hl_pair_mass_decimal38": {
        "keys": ["q_ml_cliffs_delta", "q_ml_hodges_lehmann"],
        "carrier": DEC38,
        "law": "dominance/difference pair mass over the dollar-band"
        " grid folds in DECIMAL(38,0) (widened AT REGISTRATION, r13 —"
        " the gamma precedent): total mass n1*n2 gains TWO decades per"
        " data decade; the HL weighted sum |Σ db*mass| adds the <=981"
        " band-diff factor on top — measured = max of the two",
        "sql": """
        WITH cell AS (
          SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 2 END
                   AS grp,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                   // 100 AS b,
                 CAST(count(*) AS BIGINT) AS n
          FROM events WHERE event_type IN ('click', 'view')
          GROUP BY 1, 2
        ), x AS (
          SELECT sum(CASE WHEN grp = 1 THEN CAST(n AS DOUBLE) END)
                   AS n1,
                 sum(CASE WHEN grp = 2 THEN CAST(n AS DOUBLE) END)
                   AS n2
          FROM cell
        ), w AS (
          SELECT abs(sum(CAST(a.b - v.b AS DOUBLE)
                         * a.n * v.n)) AS wsum
          FROM (SELECT b, n FROM cell WHERE grp = 1) a
          CROSS JOIN (SELECT b, n FROM cell WHERE grp = 2) v
        )
        SELECT greatest(x.n1 * x.n2, w.wsum) AS measured
        FROM x CROSS JOIN w
        """,
    },
    "chisq_gof_dev5sq_decimal38": {
        "keys": ["q_ml_chisq_gof"],
        "carrier": DEC38,
        "law": "Σ dev5² with dev5 = 5·obs − n folds in DECIMAL(38,0)"
        " (widened AT REGISTRATION, r13): |dev5| <= 4n so the square"
        " crosses int64 at ~7.6e8 orders — inside the orders decade"
        " ladder; the fixture's near-uniform priorities keep the"
        " MEASURED value far below the worst case, which is the point"
        " of measuring",
        "sql": """
        WITH g AS (
          SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS obs
          FROM orders GROUP BY 1
        ), tot AS (
          SELECT CAST(sum(obs) AS BIGINT) AS n FROM g
        )
        SELECT sum(CAST(5 * obs - n AS DOUBLE)
                   * (5 * obs - n)) AS measured
        FROM g CROSS JOIN tot
        """,
    },
    "bartlett_nq_decimal38": {
        "keys": ["q_ml_bartlett_test"],
        "carrier": DEC38,
        "law": "per-group centered-variance product n·Σcents² folds"
        " in DECIMAL(38,0) (widened AT REGISTRATION, r13): cents² ≈"
        " 2.5e15 per row makes n·q ~ n²·2.5e15 — two decades per data"
        " decade, past int64 well before sf0.1; measured = max n·q",
        "sql": """
        SELECT max(CAST(n AS DOUBLE) * q) AS measured FROM (
          SELECT o_orderpriority,
                 CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                          * 100 AS BIGINT) AS DOUBLE)
                     * CAST(CAST(o_totalprice AS DECIMAL(18,2))
                            * 100 AS BIGINT)) AS q
          FROM orders GROUP BY 1)
        """,
    },
    "jt_pair_mass_decimal38": {
        "keys": ["q_ml_jonckheere"],
        "carrier": DEC38,
        "law": "the doubled JT carrier 2JT = Σ c_j(2·below_i + c_i)"
        " over the ordered group pairs is ≤ n² pair mass — folds in"
        " DECIMAL(38,0) (widened AT REGISTRATION, r13, the gamma"
        " class); measured = the actual 2JT value",
        "sql": """
        WITH x AS (
          SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT)
                   AS g,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) // 10000 AS b
          FROM orders
        ), grid AS MATERIALIZED (
          SELECT b, g, CAST(count(*) AS BIGINT) AS c
          FROM x GROUP BY 1, 2
        ), dense AS (
          SELECT bands.b, grps.g,
                 CAST(coalesce(grid.c, 0) AS BIGINT) AS c0
          FROM (SELECT DISTINCT b FROM grid) bands
          CROSS JOIN (SELECT DISTINCT g FROM grid) grps
          LEFT JOIN grid ON grid.b = bands.b AND grid.g = grps.g
        ), mat AS (
          SELECT b, g, c0,
                 CAST(coalesce(sum(c0) OVER (PARTITION BY g ORDER BY b
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS BIGINT) AS below
          FROM dense
        )
        SELECT sum(CAST(j.c0 AS DOUBLE) * (2 * i.below + i.c0))
               AS measured
        FROM mat i JOIN mat j ON j.b = i.b AND i.g < j.g
        """,
    },
    "adf_suffstats_decimal38": {
        "keys": ["q_ts_adf_lag0", "q_ts_variance_ratio"],
        "carrier": DEC38,
        "law": "the lag-0 DF OLS quadratics Σz²/Σzy/Σy² over daily"
        " cents fold in DECIMAL(38,0) (widened AT REGISTRATION, r13 —"
        " the engle_granger precedent): Σz² ≈ 7.3e18 ALREADY at sf0.1"
        " (past int64's comfort at the base scale) and grows two"
        " decades per data decade; measured = max of the three —"
        " variance_ratio's lag-1 sum-of-squares IS this law's sum-y2"
        " and its lag-2 horizon is <=4x that mass (same class)",
        "sql": """
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS d,
                 CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase' GROUP BY 1
        ), lagged AS (
          SELECT cents, lag(cents) OVER (ORDER BY d) AS z FROM daily
        ), pairs AS (
          SELECT CAST(cents - z AS DOUBLE) AS y, CAST(z AS DOUBLE) AS z
          FROM lagged WHERE z IS NOT NULL
        )
        SELECT greatest(sum(z * z), abs(sum(z * y)), sum(y * y))
               AS measured
        FROM pairs
        """,
    },
    "simpson_collision_decimal38": {
        "keys": ["q_llm_simpson_diversity"],
        "carrier": DEC38,
        "law": "per-lang collision mass Σ n_i(n_i-1) folds in"
        " DECIMAL(38,0) (widened AT REGISTRATION, r13): a degenerate"
        " single-token language makes it N² (the gamma pair-mass"
        " class — two decades per data decade on a skewed vocab);"
        " measured = max per-lang mass",
        "sql": """
        WITH tok AS (
          SELECT lang, unnest(string_split(text, ' ')) AS w
          FROM documents
        ), tf AS (
          SELECT lang, w, CAST(count(*) AS BIGINT) AS c
          FROM tok GROUP BY 1, 2
        )
        SELECT max(m) AS measured FROM (
          SELECT lang, sum(CAST(c AS DOUBLE) * (c - 1)) AS m
          FROM tf GROUP BY lang)
        """,
    },
    "kpss_carriers_decimal38": {
        "keys": ["q_ts_kpss_lag0"],
        "carrier": DEC38,
        "law": "Σu² and Σv² (v = prefix sum of the u = n·x − Σx"
        " carrier) fold in DECIMAL(38,0) (widened AT REGISTRATION,"
        " r13): v ~ n·cumsum is ~9.6e15 at events-10000× so its"
        " square is ~9e31 — far past int64, 6 decades inside"
        " DECIMAL(38); measured = max(Σu², Σv²); per-row u and v"
        " themselves stay exact int64 (the acf_u law bound times"
        " the ≤62-day factor)",
        "sql": """
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS d,
                 CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase' GROUP BY 1
        ), st AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(cents) AS BIGINT) AS sx
          FROM daily
        ), u AS (
          SELECT d, CAST(st.n * daily.cents - st.sx AS DOUBLE) AS u
          FROM daily CROSS JOIN st
        ), v AS (
          SELECT u, sum(u) OVER (ORDER BY d
                 ROWS UNBOUNDED PRECEDING) AS v
          FROM u
        )
        SELECT greatest(sum(u * u), sum(v * v)) AS measured FROM v
        """,
    },
}


# Laws that read ONLY the events table — the moment-folding class the
# decade ladder keeps catching (VERDICT r08 item 6 names exactly this
# burstiness/ar1/bollinger family for the 1000× spot-probe).
EVENTS_ONLY_LAWS = {
    "granger_suffstats_decimal38",
    "acf_u_carrier_int64",
    "acf_ssu_decimal38",
    "dft_residue_bins_int64",
    "ar1_cramer_decimal38",
    "bollinger_quadform_decimal38",
    "stl_quadsum_decimal38",
    # r11 waves 4-5: the experimentation family's quadratic carriers
    # (all events-only reads).
    "cuped_quadratic_decimal38",
    "bh_fdr_pairdelta_decimal38",
    "eventstudy_car_int64",
    "engle_granger_ols_decimal38",
    # r12: the dyadic-EWMA carrier and the replication-invariant
    # Cochran numerator (both events-only reads).
    "ewma_carrier_decimal38",
    "cochran_colsq_int64",
    # r13: the click/view effect-size quadratic (events-only read).
    "effect_sizes_q_decimal38",
    # r13 wave 2: the cliffs/HL dominance pair mass (events-only read).
    "cliffs_hl_pair_mass_decimal38",
    # r13 wave 3: the lag-0 DF OLS quadratics (events-only read).
    "adf_suffstats_decimal38",
    # r13 coda: the KPSS u/v quadratic carriers (events-only read).
    "kpss_carriers_decimal38",
}

# Laws that read ONLY lineitem/orders — the other carrier class the
# decade ladder keeps spending (shapley at 100×→1000× was the thinnest;
# VERDICT r09 item 3 asks for the 1000× probe to cover this family too).
LINEITEM_FAMILY_LAWS = {
    "shapley_deviation_decimal38",
    "shapley_rowterm_int64",
    "ttest_paired_revcc_int64",
    "spearman_moments_decimal38",
    "boost_weighted_err_decimal38",
    "boost_round2_weight_decimal38",
    "linreg_syy_decimal38",
    "cm_inner_product_int64",
    "target_encoding_sums_int64",
    # r11: the backbone numerator law reads lineitem⋈orders (through
    # the degree-capped co-occurrence graph), so the lineitem decade
    # probe measures it at fact scale too.
    "modularity_numerator_decimal38",
    # r12: the Brown-Forsythe Σz² quadratic (orders-only read — rides
    # the lineitem/orders decade since that materializer scales orders).
    "levene_absdev_q_decimal38",
    # r13: the gamma pair-mass quadratic and the Dunn midrank carriers
    # (both orders-only reads — same ladder as levene).
    "gamma_pair_mass_decimal38",
    "dunn_rank_carriers_decimal38",
    # r13 wave 2: the GOF squared-deviation fold (orders-only read).
    "chisq_gof_dev5sq_decimal38",
    # r13 wave 3: the Bartlett variance product and the JT doubled
    # carrier (both orders-only reads).
    "bartlett_nq_decimal38",
    "jt_pair_mass_decimal38",
}


def ensure_table_scale(
    base_dir: str, factor: int, table: str, key_cols: tuple[str, ...]
) -> str:
    """Materialize (once) a ``factor``× copy of ONE fixture table,
    straight through DuckDB — no Spark session, no decorrelation caps
    (copies only shift the integer key columns by i·10⁹; values and
    timestamps are untouched, i.e. the same domain at factor× density,
    which is exactly the carrier-magnitude regime the moment laws must
    survive). Key shifts are CONSISTENT across tables (the same
    i·10⁹ per copy), so lineitem↔orders joins survive replication.
    This is how the 1000× decade probe stays a minutes-scale job
    instead of a full fixture materialization."""
    import duckdb

    scratch = os.environ.get(
        "KHOSE_MARGIN_SCRATCH",
        os.path.dirname(
            os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/khose_scale")
        )
        or "/tmp",
    )
    dest = os.path.join(scratch, f"khose_margin_{table}_x{factor}")
    marker = os.path.join(dest, f"_{table.upper()}_x{factor}_OK")
    out = os.path.join(dest, f"{table}.parquet")
    if os.path.exists(marker):
        return out
    # Disk pre-flight (r11: two mid-COPY/mid-law ENOSPC casualties):
    # projected size = factor x the base parquet (replication does not
    # compress better — measured 32 GB for lineitem x3000 from 10.8 MB),
    # plus a 20 GB working margin for DuckDB spill during the laws.
    # Refuse UP FRONT with the budget math instead of dying mid-write.
    base_bytes = os.path.getsize(f"{base_dir}/{table}.parquet")
    projected = base_bytes * factor
    # statvfs the filesystem we actually write to (scratch may be on
    # a different mount than /tmp when SPARK_GRAFT_SCALE_DIR is set).
    st = os.statvfs(scratch if os.path.isdir(scratch) else "/tmp")
    free = st.f_bavail * st.f_frsize
    margin = 20 * 1024**3
    if projected + margin > free:
        raise SystemExit(
            f"refusing to materialize {table} x{factor}: projected "
            f"{projected / 1e9:.1f} GB + {margin / 1e9:.0f} GB working "
            f"margin > {free / 1e9:.1f} GB free on {scratch} — pick a "
            f"smaller factor (the r10 verdict sanctions falling back, "
            f"e.g. 3000x instead of 10000x for lineitem)"
        )
    os.makedirs(dest, exist_ok=True)
    repl = ", ".join(
        f"{k} + c.i * 1000000000 AS {k}" for k in key_cols
    )
    con = duckdb.connect()
    # 64 GB of the 128 GiB host (override via KHOSE_DUCKDB_MEM): the
    # 3000x shapley/modularity laws spill tens of GB under a 24 GB cap
    # (two disk-full casualties in r11) but fit mostly in memory here.
    con.sql(
        "SET memory_limit='"
        + os.environ.get("KHOSE_DUCKDB_MEM", "64GB")
        + "'"
    )
    con.sql("SET temp_directory='/tmp/khose_duckdb_spill'")
    # Without this, COPY preserves insertion order by BUFFERING the
    # whole replicated relation (600M lineitem rows spilled >60 GB and
    # filled the disk); row order is irrelevant to every consumer here.
    con.sql("SET preserve_insertion_order=false")
    con.sql(
        f"""
        COPY (
          SELECT * REPLACE ({repl})
          FROM '{base_dir}/{table}.parquet',
               (SELECT unnest(range(0, {factor})) AS i) c
        ) TO '{out}' (FORMAT PARQUET)
        """
    )
    con.close()
    with open(marker, "w") as f:
        f.write("ok\n")
    return out


def ensure_events_scale(base_dir: str, factor: int) -> str:
    return ensure_table_scale(base_dir, factor, "events", ("event_id",))


def ensure_lineitem_scale(base_dir: str, factor: int) -> dict[str, str]:
    """lineitem + orders at ``factor``×, join keys shifted in lockstep
    (l_orderkey and o_orderkey get the same per-copy offset)."""
    return {
        "lineitem": ensure_table_scale(
            base_dir, factor, "lineitem", ("l_orderkey",)
        ),
        "orders": ensure_table_scale(
            base_dir, factor, "orders", ("o_orderkey",)
        ),
    }


def run(
    sf_dir: str,
    overrides: dict[str, str] | None = None,
    law_subset: set[str] | None = None,
) -> dict:
    import duckdb

    con = duckdb.connect()
    # 64 GB of the 128 GiB host (override via KHOSE_DUCKDB_MEM): the
    # 3000x shapley/modularity laws spill tens of GB under a 24 GB cap
    # (two disk-full casualties in r11) but fit mostly in memory here.
    con.sql(
        "SET memory_limit='"
        + os.environ.get("KHOSE_DUCKDB_MEM", "64GB")
        + "'"
    )
    con.sql("SET temp_directory='/tmp/khose_duckdb_spill'")
    overrides = overrides or {}
    for tname in TABLES:
        path = overrides.get(tname, f"{sf_dir}/{tname}.parquet")
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {tname} AS SELECT * FROM '{path}'")
    results: dict[str, dict] = {}
    worst_ok = True
    laws = (
        {k: v for k, v in LAWS.items() if k in law_subset}
        if law_subset is not None
        else LAWS
    )
    for name, law in laws.items():
        try:
            measured = con.sql(law["sql"]).fetchone()[0]
            measured = float(measured) if measured is not None else 0.0
            import math

            decades = (
                math.log10(law["carrier"] / measured)
                if measured > 0
                else float("inf")
            )
            status = (
                "OVERFLOW"
                if measured > law["carrier"]
                else ("thin" if decades < MIN_DECADES else "ok")
            )
        except Exception as exc:  # noqa: BLE001 — report, keep auditing
            measured, decades, status = None, None, f"ERROR: {exc}"
        if status != "ok":
            worst_ok = False
        results[name] = {
            "keys": law["keys"],
            "carrier": law["carrier"],
            "measured": measured,
            "decades_of_headroom": (
                round(decades, 2) if isinstance(decades, float) else None
            ),
            "status": status,
            "law": law["law"],
        }
        print(f"{status:8s} {name}: measured={measured!r} "
              f"decades={results[name]['decades_of_headroom']}",
              file=sys.stderr)
    con.close()
    return {"dir": sf_dir, "green": worst_ok, "laws": results}


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    overrides: dict[str, str] = {}
    law_subset: set[str] | None = None
    tag = None
    for a in sys.argv[1:]:
        if a.startswith("--dir="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--factor="):
            f = int(a.split("=", 1)[1])
            sf_dir = (
                os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/khose_scale")
                + f"_sf0.1_x{f}"
            )
        elif a.startswith("--events-factor="):
            # events-only decade probe (1000× and beyond): materialize
            # just the events table and audit the moment-folding class.
            f = int(a.split("=", 1)[1])
            overrides["events"] = ensure_events_scale(sf_dir, f)
            law_subset = EVENTS_ONLY_LAWS
            tag = f"{sf_dir} [events x{f}]"
        elif a.startswith("--lineitem-factor="):
            # lineitem/orders decade probe (VERDICT r09 item 3): extend
            # the 1000× ladder beyond events — join keys shift in
            # lockstep so lineitem↔orders keys still match.
            f = int(a.split("=", 1)[1])
            overrides.update(ensure_lineitem_scale(sf_dir, f))
            law_subset = LINEITEM_FAMILY_LAWS
            tag = f"{sf_dir} [lineitem x{f}]"
    for a in sys.argv[1:]:
        if a.startswith("--laws="):
            # Re-run a named subset (e.g. laws that ERRORed on a
            # transient disk-full) and MERGE into the dir's existing
            # entry instead of replacing it — the other laws' measured
            # rows survive.
            named = set(a.split("=", 1)[1].split(","))
            unknown = named - set(LAWS)
            if unknown:
                print(f"unknown laws: {sorted(unknown)}", file=sys.stderr)
                return 2
            if law_subset is None:
                law_subset = named
            else:
                # Decade probes restrict to a family subset; a --laws
                # list entirely outside that family would previously
                # fall back to the full named set and run out-of-family
                # laws against a dir where only one table is scaled,
                # merging misleading "measured" margins. Error instead.
                inter = law_subset & named
                if not inter:
                    print(
                        "--laws does not intersect the active family "
                        f"subset: {sorted(named)} vs "
                        f"{sorted(law_subset)}",
                        file=sys.stderr,
                    )
                    return 2
                law_subset = inter
    report = run(sf_dir, overrides=overrides, law_subset=law_subset)
    if tag:
        report["dir"] = tag
        sf_dir = tag
    path = os.path.join(REPO, "MARGIN_AUDIT.json")
    merged: dict = {}
    if os.path.exists(path):
        try:
            merged = json.load(open(path))
        except (OSError, ValueError):
            merged = {}
    prior = merged.get(sf_dir)
    if prior and isinstance(prior.get("laws"), dict):
        # Per-law merge: a subset re-run refreshes only the laws it
        # measured; green is recomputed over the merged set.
        prior["laws"].update(report["laws"])
        prior["green"] = all(
            v.get("status") == "ok" for v in prior["laws"].values()
        )
        prior["dir"] = report["dir"]
        report = prior
    merged[sf_dir] = report
    with open(path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(json.dumps({"dir": sf_dir, "green": report["green"]}))
    return 0 if report["green"] else 1


if __name__ == "__main__":
    sys.exit(main())
