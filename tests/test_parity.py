"""The core gate: every registered query with an oracle must hash-match
DuckDB on the fixture tables (driver-loop replica, SURVEY.md §5.2)."""

from __future__ import annotations

import pytest

from khose_spark import registry
from tests._parity import compare, run_query_cache_checked

registry.load_all()

ORACLE_KEYS = sorted(registry.ORACLES)
ROWS_ONLY_KEYS = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_parity(key, spark, ddb, sf_dir):
    # run_query_cache_checked doubles as the cache-lifecycle gate: a
    # query that persists without releasing fails HERE, not in a
    # separate (slow) second sweep of all registered queries.
    df = run_query_cache_checked(key, registry.QUERIES[key], spark, sf_dir)
    spark_pdf = df.toPandas()
    oracle_pdf = ddb.sql(registry.ORACLES[key]).df()
    problems = compare(spark_pdf, oracle_pdf)
    assert not problems, f"{key}: " + "; ".join(problems)


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_runs(key, spark, sf_dir):
    df = run_query_cache_checked(key, registry.QUERIES[key], spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("key", sorted(registry.QUERIES))
def test_no_complex_output_columns(key, spark, sf_dir):
    """The driver's canonicalizer pandas-sorts every output column and
    dies on ndarray/dict cells (TypeError: unhashable type — the two
    round-2 red rows). EVERY registered query — oracle-checked or
    rows-only — must therefore emit scalar columns only. Arrays belong
    inside the plan, never in the output schema: project to element_at
    scalars or concat_ws strings at the boundary."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = registry.QUERIES[key](spark, sf_dir)
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{key} emits complex-typed output columns the driver canon "
        f"cannot sort: {bad}"
    )
