"""Unit tests for khose_spark.oracle_opt — the DuckDB CTE
materialization hint used by the 10× oracle sweep (pure string
transformation; the result-parity of the rewrite over the real oracle
board was validated empirically in round 7: 78/80 identical at
sf0.001, 2 documented round-boundary skips)."""

from __future__ import annotations

import duckdb

from khose_spark.oracle_opt import (
    flag_multiref_ctes,
    materialize_multiref_ctes,
)

_CHAINED = """
WITH edges AS (
  SELECT o_orderkey AS a, o_custkey AS b FROM orders
), deg AS (
  SELECT a, count(*) AS d FROM edges GROUP BY a
), joined AS (
  SELECT e.a, e.b, d1.d FROM edges e JOIN deg d1 ON d1.a = e.a
)
SELECT * FROM joined j JOIN deg d2 ON d2.a = j.b
"""


def test_flags_multiref_fact_ctes():
    # edges: fact-scale (orders), referenced by deg + joined = 2 -> flag
    # deg: transitively fact-scale via edges, referenced 2x -> flag
    # joined: referenced once -> no flag
    assert flag_multiref_ctes(_CHAINED) == ["edges", "deg"]


def test_rewrite_inserts_materialized_only_where_flagged():
    rw = materialize_multiref_ctes(_CHAINED)
    assert "edges AS MATERIALIZED (" in rw
    assert "deg AS MATERIALIZED (" in rw
    assert "joined AS (" in rw  # single-ref stays inline


def test_rewrite_is_idempotent():
    rw = materialize_multiref_ctes(_CHAINED)
    assert materialize_multiref_ctes(rw) == rw
    assert rw.count("MATERIALIZED") == 2


def test_dim_only_ctes_stay_inline():
    sql = """
    WITH dims AS (
      SELECT r_regionkey AS k FROM region
    )
    SELECT a.k, b.k FROM dims a JOIN dims b ON a.k < b.k
    """
    assert flag_multiref_ctes(sql) == []
    assert materialize_multiref_ctes(sql) == sql


def test_rewritten_sql_runs_and_matches():
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW orders AS SELECT * FROM "
        "'/root/testdata/sf0.001/orders.parquet'"
    )
    con.sql(
        "CREATE VIEW region AS SELECT * FROM "
        "'/root/testdata/sf0.001/region.parquet'"
    )
    a = con.sql(_CHAINED).df()
    b = con.sql(materialize_multiref_ctes(_CHAINED)).df()
    cols = list(a.columns)
    assert a.sort_values(cols).reset_index(drop=True).equals(
        b.sort_values(cols).reset_index(drop=True)
    )
    con.close()


_LITERAL_TRAPS = """
WITH pat AS (
  SELECT l_orderkey, ':-) unbalanced ( paren -- not a comment' AS smiley,
         regexp_extract(l_comment, '([a-z]+) \\(deposits?\\)') AS hit
  FROM lineitem
), -- events in this comment must not mark the next CTE fact-scale
dims AS (
  SELECT 'pat pat pat' AS pat_talk, r_regionkey AS k FROM region
)
SELECT p.l_orderkey, a.k, b.k
FROM pat p JOIN dims a ON a.k = p.l_orderkey % 5
           JOIN pat q ON q.l_orderkey = p.l_orderkey
           JOIN dims b ON b.k < a.k
"""


def test_literals_and_comments_do_not_skew_parse():
    # ADVICE r07: the ')' and '(' inside pat's string literal would
    # mis-span the CTE body under naive balancing (swallowing dims), and
    # the three 'pat' tokens inside dims' literal would inflate pat's
    # reference count; the '-- not a comment' text inside the literal
    # must survive while the real -- comment (containing the fact word
    # 'events') must not make dims fact-scale.
    flags = flag_multiref_ctes(_LITERAL_TRAPS)
    assert flags == ["pat"]  # 2 real refs; dims is dim-only despite 2 refs
    rw = materialize_multiref_ctes(_LITERAL_TRAPS)
    assert "pat AS MATERIALIZED (" in rw
    assert "dims AS (" in rw
    # the rewrite must not touch literal text
    assert "':-) unbalanced ( paren -- not a comment'" in rw
    assert "'pat pat pat'" in rw


def test_escaped_quote_literals_mask_cleanly():
    sql = "WITH a AS (SELECT 'it''s a ( trap' AS s FROM lineitem) " \
          "SELECT x.s, y.s FROM a x JOIN a y ON x.s = y.s"
    assert flag_multiref_ctes(sql) == ["a"]
    rw = materialize_multiref_ctes(sql)
    assert "'it''s a ( trap'" in rw and "a AS MATERIALIZED (" in rw
