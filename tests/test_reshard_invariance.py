"""Partition-layout (resharding) invariance — the determinism claim
behind the md5-bucket sampling/dedup/eval family made enforceable.

Several operators advertise "resharding-invariant" outputs: the answer
depends only on CONTENT, never on how rows happen to be distributed
across files/partitions. That claim is what makes a 100 TB re-ingest
(different file count, different row order) reproduce the same splits,
samples, signatures, and metrics. This suite rewrites every fixture
table into a different physical layout (7-way round-robin repartition —
different file count AND different row order within files) and asserts
each representative key produces the identical canonical result.

A failure here means an operator is accidentally coupled to row order
or partitioning (e.g. a window missing a total-order tiebreak, a
first()/limit without a sort) — exactly the class of bug that passes
every single-layout parity test and then diverges in production.
"""

from __future__ import annotations

import pytest

from khose_spark import registry
from khose_spark.tables import TABLES, t
from tests._parity import canon_frame

registry.load_all()

# Representative keys that claim content-only determinism, one per
# family: hash splits/samples, signature dedup, banded eval metrics,
# windows with tiebreaks, iterative graph, session/order analytics.
RESHARD_KEYS = [
    "q_llm_split_assign",
    "q_llm_hash_sample",
    "q_llm_reservoir_sample",
    "q_llm_minhash_det",
    "q_llm_simhash",
    "q_llm_exact_dedup",
    "q_llm_incremental_dedup",
    "q_ml_auc",
    "q_agg_spearman",
    "q_ts_sessionize",
    "q_ts_rolling_wau",
    "q_win_streaks",
    "q_graph_pagerank",
    "q_er_golden_record",
]


@pytest.fixture(scope="module")
def resharded_dir(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("resharded")
    for name in TABLES:
        # Round-robin repartition: different file count and different
        # row order than the single-file fixture. t() reads the
        # directory fine (and the rewrite normalizes timestamps, which
        # t() also accepts — plain TIMESTAMP).
        t(spark, sf_dir, name).repartition(7).write.mode(
            "overwrite"
        ).parquet(str(out / f"{name}.parquet"))
    return str(out)


@pytest.mark.parametrize("key", RESHARD_KEYS)
def test_result_is_layout_invariant(key, spark, sf_dir, resharded_dir):
    base = canon_frame(registry.QUERIES[key](spark, sf_dir).toPandas())
    resharded = canon_frame(
        registry.QUERIES[key](spark, resharded_dir).toPandas()
    )
    assert base == resharded, (
        f"{key}: result depends on physical layout — a window tiebreak "
        "or ordering guarantee is missing"
    )
