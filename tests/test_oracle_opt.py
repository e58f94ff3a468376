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
