"""Regenerate PLANS.md: formatted physical plans for a representative
query slice, with the scale rationale from each query's docstring.

Run: python scripts/gen_plans.py   (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from khose_spark import registry  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# One representative per plan family: scan+agg, broadcast star join,
# window top-k, shingle band join, GEMM top-k, spine gap-fill,
# blocking-key fuzzy join, salted skew join.
SHOWCASE = [
    "q_agg_flagship_pricing",
    "q_tpch_q5_local_volume",
    "q_tpch_q6_forecast",
    "q_win_topk_per_group",
    "q_llm_simhash",
    "q_llm_cosine_topk_blocked",
    "q_ts_gapfill",
    "q_ts_twa",
    "q_fn_levenshtein",
    "q_join_salted",
    # Round-4 families: tokenizer induction (iterative windows), NB
    # classification (broadcast model), portable MinHash banding,
    # bitmap distinct, capped co-occurrence self-join.
    "q_llm_bpe_merges",
    "q_ml_naive_bayes",
    "q_llm_minhash_det",
    "q_agg_bitmap_distinct",
    "q_graph_cooccurrence",
    # Round-5 families: synthesized-partsupp star join, two-job
    # bucketed ANN search (zero-shuffle ADC aggregation), cluster-
    # bounded semantic dedup, window-only CUSUM changepoint,
    # all-integer unrolled LTTB downsampling.
    "q_tpch_q9_product_profit",
    "q_llm_ann_pq_indexed",
    "q_llm_semdedup",
    "q_ts_changepoint",
    "q_ts_lttb_downsample",
    # Round-5b families: window-scan sorted-neighborhood ER (no
    # self-join), checkpointed triangle enumeration, distributed
    # first-occurrence Heaps curve, broadcast-weight gradient descent.
    "q_er_sorted_neighborhood",
    "q_graph_triangles",
    "q_llm_heaps",
    "q_ml_logreg",
    # Round-5c families: all-integer quality-rule audit (one scan),
    # ntile tercile bucketing, per-series integer Holt recursion
    # (applyInPandas), k-NN-backbone label propagation, pattern-level
    # Fellegi-Sunter scoring, rank-formulation Gini.
    "q_llm_gopher_rules",
    "q_llm_ccnet_buckets",
    "q_ts_holt_forecast",
    "q_graph_labelprop",
    "q_er_fellegi_sunter",
    "q_agg_gini",
    # Round-5d families: grid-exact banded AUC (no per-row ranking),
    # per-FK-edge membership audit, explode-to-center Hampel window,
    # RAKE phrase mining, frontier BFS on the shared backbone, banded
    # midrank Spearman, delta-vs-base incremental dedup.
    "q_ml_auc",
    "q_dq_referential",
    "q_ts_hampel",
    "q_llm_rake",
    "q_graph_bfs",
    "q_agg_spearman",
    "q_llm_incremental_dedup",
    # Round-5d second wave: all-integer held-out Brier via the
    # single-scan grid split, lossless bucket rewrite of the
    # no-equi-key range join.
    "q_ml_brier",
    "q_join_range_bucketed",
    # Round-7: span-hash partial-duplication dedup (occurrence-linear,
    # the no-pair-enumeration scale shape).
    "q_llm_sentence_dedup",
    # Round-9 families: constant-k broadcast-fold ANN (the fixed-seed
    # twin retiring the sampled-codebook n²/50 contract), band-
    # candidate exact-verify dedup, single-grid-shuffle AdaBoost,
    # one-shuffle CM sketch build.
    "q_llm_ann_pq_rerank_fixedk",
    "q_llm_neardup_jaccard_banded",
    "q_ml_boosted_stumps",
    "q_agg_cm_join_estimate",
    # Round-10 families: corpus-scaled refinement pool (the gated
    # recall-at-scale key — ids-only pool broadcast), multi-probe IVF
    # routing, target-distribution importance scoring (broadcast LLR
    # model), banded-midrank k-group rank test, exact-integer
    # seasonal smoothing recursion.
    "q_llm_ann_pq_rerank_scaled",
    "q_llm_ann_ivf_probed",
    "q_llm_dsir",
    "q_ml_kruskal_wallis",
    "q_ts_holt_winters",
    # Round-11 families: pooled-moment CUPED fold, per-source cap
    # window, absent-term-identity JSD join, user-window disorder
    # audit, patch-grid mapInPandas kernel, per-user Croston
    # recursion, backbone conductance folds.
    "q_ml_cuped",
    "q_llm_domain_cap",
    "q_llm_jsd_sources",
    "q_stream_disorder_batchsem",
    "q_mm_patchify",
    "q_ts_croston",
    "q_graph_conductance",
]

LAYOUT_NOTES = """\
## File-layout notes (zone maps / data skipping)

Measured via scan metrics in `tests/test_dataskipping.py` (sorted vs
unsorted writes, 32 KB row groups, numOutputRows after pruning):

- **Sorting the hot filter column at write time is what makes
  predicate pushdown pay**: a shipdate range query over
  date-sorted lineitem reads ~13% of rows (matching prefix + one
  boundary row group); the same query over orderkey-sorted data reads
  100%. The ingest pipeline's compaction pass is where the sort
  belongs (closed partitions, off the hot path).
- **Engine finding**: pushed range filters on raw TIMESTAMP_NTZ
  columns do NOT engage parquet row-group stats skipping in this
  build (bigint / date / adjusted-to-UTC micros all prune fine).
  The ingest layout therefore normalizes NTZ away (tables.t does) or
  derives a DATE sort column before the sorted write. Pinned by a
  strict xfail so a Spark fix is detected.
"""


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("gen-plans")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    registry.load_all()
    out = [
        "# PLANS — physical-plan audit of representative queries",
        "",
        "Auto-generated by `scripts/gen_plans.py` at sf0.001 (plan shape is",
        "scale-independent; AQE may further coalesce/convert at runtime).",
        "Every registered query is additionally gated by",
        "`tests/test_plans.py` (no cartesians, BNLJ allowlist, per-query",
        "shuffle budgets, pushdown/pruning assertions).",
        "",
        LAYOUT_NOTES,
    ]
    # Operators that end in an eager localCheckpoint (the cache-
    # lifecycle release pattern) would render as a bare ExistingRDD
    # scan. For the AUDIT rendering, checkpoints still EXECUTE for real
    # (so iterative loops keep their genuine checkpoint-chunked shape —
    # a no-op here inlined q_graph_bfs to a 9000-operator artifact that
    # never runs), but the LAST pre-checkpoint DataFrame is recorded,
    # and when the returned plan is a bare checkpoint scan we render
    # that recorded interior: the real plan of the query's final job.
    # (plans.lock.json intentionally pins the registered post-checkpoint
    # behavior instead.)
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _CDF
    except ImportError:  # pragma: no cover - older layout
        from pyspark.sql import DataFrame as _CDF

    _orig_lcp = _CDF.localCheckpoint
    _last_pre: dict = {}

    def _recording(self, *args, **kwargs):
        # Snapshot the FORMATTED plan now, while the query's caches are
        # still live and spliced in — the plan the checkpoint actually
        # executes (rendering after the query returns would re-inline
        # the whole lineage, since the release pattern has unpersisted
        # its intermediates by then). Signature is pass-through so
        # Spark 4's storageLevel kwarg (and anything future) survives.
        _last_pre["explained"] = self._sc._jvm.PythonSQLUtils.explainString(
            self._jdf.queryExecution(), "formatted"
        )
        return _orig_lcp(self, *args, **kwargs)

    _CDF.localCheckpoint = _recording  # type: ignore

    try:
        for key in SHOWCASE:
            fn = registry.QUERIES[key]
            doc = (getattr(fn, "__doc__", "") or "").strip()
            spark.catalog.clearCache()
            _last_pre.clear()
            df = fn(spark, SF_DIR)
            final_plan = df._jdf.queryExecution().executedPlan().toString()
            pre_explained = None
            if "explained" in _last_pre and final_plan.count("\n") <= 3 and (
                "ExistingRDD" in final_plan
            ):
                pre_explained = _last_pre["explained"]
            plan = pre_explained or df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out.append(f"## {key}")
            out.append("")
            if doc:
                out.append(doc)
                out.append("")
            out.append("```")
            out.append(plan.rstrip())
            out.append("```")
            out.append("")
    finally:
        _CDF.localCheckpoint = _orig_lcp  # type: ignore
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans)")


if __name__ == "__main__":
    main()
