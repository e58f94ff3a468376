"""Unit tests for khose_spark.digestcmp — the aggregate-contract
compare that lets the 100× oracle board cover O(n)-row-returning keys
(pure DuckDB; the Spark-side integration is exercised by
scripts/verify_sweep.py --digest, whose self-check cross-validates the
digest verdict against the pandas compare at sf0.01)."""

from __future__ import annotations

import os

import duckdb
import pytest

from khose_spark.digestcmp import (
    canon_expr,
    digest_compare,
    digest_sql,
    type_category,
)


def _write_parquet(con, sql, dest):
    os.makedirs(dest, exist_ok=True)
    con.sql(
        f"COPY ({sql}) TO '{dest}/part-0.parquet' (FORMAT PARQUET)"
    )


def test_type_categories_collapse_like_pandas_canon():
    assert type_category("INTEGER") == type_category("BIGINT") == "int"
    assert type_category("HUGEINT") == "int"
    assert type_category("DOUBLE") == type_category("DECIMAL(38,6)") == "float"
    assert type_category("DOUBLE[]") == "list<float>"
    assert type_category("TIMESTAMP_NS") == "ts"
    assert type_category("VARCHAR") == "str"
    assert type_category("INTEGER") != type_category("DOUBLE")


def test_identical_relations_pass(tmp_path):
    con = duckdb.connect()
    sql = (
        "SELECT x AS k, x * 1.5 AS v, CAST(x AS VARCHAR) AS s "
        "FROM range(1000) t(x)"
    )
    _write_parquet(con, sql, str(tmp_path / "r"))
    problems, n = digest_compare(con, sql, str(tmp_path / "r"))
    assert problems == [] and n == 1000


def test_row_order_is_insensitive(tmp_path):
    con = duckdb.connect()
    base = "SELECT x AS k FROM range(100) t(x)"
    _write_parquet(con, base + " ORDER BY x DESC", str(tmp_path / "r"))
    problems, _ = digest_compare(con, base, str(tmp_path / "r"))
    assert problems == []


def test_single_value_perturbation_fails(tmp_path):
    con = duckdb.connect()
    base = "SELECT x AS k, x * 2 AS v FROM range(1000) t(x)"
    bad = (
        "SELECT x AS k, CASE WHEN x = 977 THEN x * 2 + 1 ELSE x * 2 END"
        " AS v FROM range(1000) t(x)"
    )
    _write_parquet(con, bad, str(tmp_path / "r"))
    problems, _ = digest_compare(con, base, str(tmp_path / "r"))
    assert problems and "digest" in problems[0]


def test_float_last_ulp_difference_passes(tmp_path):
    # the 12-significant-digit canon absorbs accumulation-order ulps,
    # exactly like tests/_parity.canon_value
    con = duckdb.connect()
    base = "SELECT 0.1 + 0.2 AS v"
    _write_parquet(con, "SELECT 0.3 AS v", str(tmp_path / "r"))
    problems, _ = digest_compare(con, base, str(tmp_path / "r"))
    assert problems == []


def test_nan_and_negative_zero_normalize(tmp_path):
    con = duckdb.connect()
    base = "SELECT CAST('nan' AS DOUBLE) AS a, -0.0 AS b"
    _write_parquet(
        con, "SELECT CAST(NULL AS DOUBLE) AS a, 0.0 AS b", str(tmp_path / "r")
    )
    problems, _ = digest_compare(con, base, str(tmp_path / "r"))
    assert problems == []


def test_int_width_difference_passes_int_vs_float_fails(tmp_path):
    con = duckdb.connect()
    _write_parquet(
        con, "SELECT CAST(x AS INTEGER) AS k FROM range(10) t(x)",
        str(tmp_path / "r"),
    )
    ok, _ = digest_compare(
        con, "SELECT CAST(x AS BIGINT) AS k FROM range(10) t(x)",
        str(tmp_path / "r"),
    )
    assert ok == []
    bad, _ = digest_compare(
        con, "SELECT CAST(x AS DOUBLE) AS k FROM range(10) t(x)",
        str(tmp_path / "r"),
    )
    assert bad and "type categories" in bad[0]


def test_column_set_mismatch_fails(tmp_path):
    con = duckdb.connect()
    _write_parquet(con, "SELECT 1 AS a, 2 AS b", str(tmp_path / "r"))
    bad, _ = digest_compare(con, "SELECT 1 AS a, 2 AS c", str(tmp_path / "r"))
    assert bad and "columns" in bad[0]


def test_list_and_timestamp_canon(tmp_path):
    con = duckdb.connect()
    sql = (
        "SELECT [1.5, 2.5]::DOUBLE[] AS e, "
        "TIMESTAMP '2024-01-02 03:04:05' AS ts, x AS k "
        "FROM range(5) t(x)"
    )
    _write_parquet(con, sql, str(tmp_path / "r"))
    problems, n = digest_compare(con, sql, str(tmp_path / "r"))
    assert problems == [] and n == 5


def test_empty_spark_result_count_only(tmp_path):
    con = duckdb.connect()
    os.makedirs(tmp_path / "empty", exist_ok=True)
    ok, n = digest_compare(
        con, "SELECT 1 AS a WHERE false", str(tmp_path / "empty")
    )
    assert ok == [] and n == 0
    bad, _ = digest_compare(con, "SELECT 1 AS a", str(tmp_path / "empty"))
    assert bad


def test_digest_sql_orders_columns_by_name():
    s = digest_sql("t", [("a", "int"), ("b", "float")])
    assert s.index('"a"') < s.index('"b"')
