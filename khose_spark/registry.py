"""Query registry: the single source of truth for SURVEY.md §2's contract.

Each operator registers under its §2 key with a Spark callable
``(spark, sf_dir) -> DataFrame`` and (usually) a DuckDB-oracle SQL
string. ``__spark_entry__.py`` exposes these verbatim to the driver.

Registered callables are wrapped so the session is always prepped (UTC,
AQE, Arrow) before the plan is built — the driver hands us ITS session.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_LOADED = False


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under §2 key ``name`` with optional DuckDB oracle.

    ``oracle=None`` declares a rows-only check (approximate/streaming ops
    per SURVEY.md §2 — the driver records the weaker check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from khose_spark.session import prep_session

            prep_session(spark)
            return fn(spark, sf_dir)

        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


def load_all() -> None:
    """Import all operator modules (side effect: registration)."""
    global _LOADED
    if _LOADED:
        return
    import khose_spark.operators  # noqa: F401

    _LOADED = True
