"""Physical-plan skeleton extraction — the drift-detection layer under
``plans.lock.json``.

`tests/test_plans.py` pins plan *budgets* (shuffle counts, no cartesian,
BNLJ allowlist), which catches plans getting *bigger* but not plans
changing *shape* inside the budget — e.g. a SortMergeJoin flipping to
BroadcastNestedLoopJoin under a future Spark upgrade, a lost
partial-aggregation stage, or a window silently gaining an extra sort.
The skeleton is the ordered list of physical operator tokens (operator
name, qualified where the flavor matters: exchange partitioning, join
strategy + join type, scan format) with every volatile detail (expression
ids, paths, plan ids, codegen stage numbers, statistics) stripped, so it
is stable across sessions and runs at a fixed fixture yet changes the
moment the physical strategy does.

`scripts/gen_planlock.py` renders every registered query's skeleton into
`plans.lock.json`; `tests/test_plans.py::test_plan_skeleton_lock` fails
on any drift, forcing plan changes to be explicit, reviewed commits.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# Join types as they appear inline in plan lines.
_JOIN_TYPES = re.compile(
    r"\b(Inner|FullOuter|LeftOuter|RightOuter|LeftSemi|LeftAnti|Cross|"
    r"ExistenceJoin)\b"
)
_PARTITIONINGS = re.compile(
    r"\b(hashpartitioning|rangepartitioning|SinglePartition|"
    r"RoundRobinPartitioning)\b"
)
_TREE_GLYPHS = re.compile(r"^[\s:+\-]*")
_CODEGEN_MARK = re.compile(r"^\*\(\d+\)\s*")
_OP_NAME = re.compile(r"[A-Za-z][A-Za-z0-9_]*")


def _token(line: str) -> str | None:
    """One canonical token for a physical-plan line, or None to skip."""
    line = _TREE_GLYPHS.sub("", line)
    line = _CODEGEN_MARK.sub("", line)
    if not line or line.startswith("=="):
        return None
    m = _OP_NAME.match(line)
    if not m:
        return None
    op = m.group(0)
    if op in ("Exchange", "AQEShuffleRead"):
        p = _PARTITIONINGS.search(line)
        return f"{op}:{p.group(1)}" if p else op
    if op.endswith("Join"):
        jt = _JOIN_TYPES.search(line)
        return f"{op}:{jt.group(1)}" if jt else op
    if op == "FileScan":
        fmt = line.split()[1] if len(line.split()) > 1 else ""
        fmt = re.sub(r"[^A-Za-z0-9]", "", fmt)
        return f"FileScan:{fmt}"
    if op == "Scan":  # Scan ExistingRDD / Scan parquet …
        kind = _OP_NAME.match(line[len("Scan") :].lstrip())
        return f"Scan:{kind.group(0)}" if kind else op
    return op


def reset_plan_state(spark) -> None:
    """Make the next plan render session-state-independent: drop every
    SQL-cache entry AND the cross-query memo caches (trade edges, k-NN
    backbone, PQ index). A memoized relation changes a consumer's plan
    depending on whether some EARLIER query built it (fresh build
    persists inside the plan → InMemoryRelation; a reused memo after
    clearCache inlines the raw subtree), so both the lock generator and
    the drift gate reset them before every key."""
    from khose_spark.operators import graph, similarity

    spark.catalog.clearCache()
    graph._TRADE_EDGES_CACHE.clear()
    graph._BACKBONE_CACHE.clear()
    similarity._PQ_INDEX_CACHE.clear()


def skeleton(df: DataFrame) -> list[str]:
    """Ordered operator-token skeleton of ``df``'s executed plan
    (initial AQE plan — rendered before execution, so deterministic at a
    fixed fixture)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    toks = []
    for line in plan.splitlines():
        tok = _token(line)
        if tok is not None:
            toks.append(tok)
    return toks
