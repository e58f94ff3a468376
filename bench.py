"""Benchmark runner — the driver executes this per round (BENCH_r{N}.json).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed to full materialization (count + a cheap checksum
collect) so lazy plans can't cheat the clock.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from khose_spark import registry
from khose_spark.session import get_spark

# Headline set: one representative per operator family (scan, filter,
# join algos, agg, window, sort, functions, LLM ops, UDF surface).
HEADLINE = [
    "q_agg_flagship_pricing",
    "q_filter_compare",
    "q_join_broadcast",
    "q_join_multiway",
    "q_join_asof",
    "q_join_salted",
    "q_tpch_q3_shipping",
    "q_tpch_q5_local_volume",
    "q_tpch_q10_returns",
    "q_agg_count_distinct",
    "q_agg_rollup",
    "q_win_running_sum",
    "q_win_topk_per_group",
    "q_sort_multikey",
    "q_fn_split_explode",
    "q_fn_json",
    "q_llm_exact_dedup",
    "q_llm_cosine_topk",
    "q_llm_cosine_topk_blocked",
    "q_llm_simhash",
    "q_llm_quality_score",
    "q_llm_text_stats",
    "q_udf_scalar_pandas",
    "q_mm_decode_features",
    "q_tpch_q18_large_volume",
    "q_tpch_q21_waiting_supplier",
    "q_tpch_q2_min_cost_supp",
    "q_tpch_q9_product_profit",
    "q_llm_pii_scrub",
    "q_llm_seq_pack",
    "q_llm_ann_pq",
    "q_dq_expectations",
    "q_scd2_history",
    "q_ts_interpolate",
    "q_llm_bpe_merges",
    "q_ml_naive_bayes",
    "q_llm_minhash_det",
    "q_agg_bitmap_distinct",
    # Round-5 scale patterns: two-job bucketed ANN search, cluster-
    # bounded semantic dedup, unrolled all-integer LTTB.
    "q_llm_ann_pq_indexed",
    "q_llm_semdedup",
    "q_ts_lttb_downsample",
    # Round-5b statistical/resolution family: ACF, Zipf fit, sorted-
    # neighborhood ER (the window-scan dedup), triangle counting.
    "q_ts_acf",
    "q_llm_zipf",
    "q_er_sorted_neighborhood",
    "q_graph_triangles",
    "q_llm_kl_divergence",
    "q_llm_heaps",
    "q_ml_logreg",
    "q_ts_window_funnel",
    "q_agg_weighted_percentile",
    "q_llm_bloom_prefilter",
    "q_ts_theil_sen",
    "q_graph_adamic_adar",
    "q_ts_m4_downsample",
    "q_llm_embedding_drift",
    "q_ts_wow_growth",
    # Round-5c curation/stat/graph family: quality-rule filters, CCNet
    # terciles, containment dedup, Holt smoothing, label propagation,
    # HITS, closed-form OLS, Gini, Fellegi-Sunter ER scoring.
    "q_llm_gopher_rules",
    "q_llm_ccnet_buckets",
    "q_llm_containment",
    "q_ts_holt_forecast",
    "q_graph_labelprop",
    "q_graph_hits",
    "q_ml_linreg_2f",
    "q_agg_gini",
    "q_er_fellegi_sunter",
    "q_ts_mann_kendall",
    # Round-5d eval/audit family: exact banded AUC, full FK-graph
    # audit, Hampel robust outliers, RAKE phrases, backbone BFS.
    "q_ml_auc",
    "q_dq_referential",
    "q_ts_hampel",
    "q_llm_rake",
    "q_graph_bfs",
    # Round-5d second wave: single-scan 5-fold CV, sessionization,
    # rolling distinct users, incremental delta-vs-base dedup,
    # nearest-direction as-of, banded Spearman.
    "q_ml_cross_val",
    "q_ts_sessionize",
    "q_ts_rolling_wau",
    "q_llm_incremental_dedup",
    "q_join_asof_nearest",
    "q_agg_spearman",
    # Round-8 family representatives (observability audits, spatial
    # joins, applyInPandas DP, URL canonicalization, one-pass bootstrap,
    # vocabulary coverage, reconciliation, skyline, spectral, Shapley):
    "q_agg_hll_audit",
    "q_join_geo_knn",
    "q_ts_dtw",
    "q_llm_url_dedup",
    "q_ml_poisson_bootstrap",
    "q_llm_vocab_coverage",
    "q_dq_reconciliation",
    "q_agg_skyline_2d",
    "q_ts_dft_power",
    "q_ml_shapley_2f",
    # Round-9 scale-linear twins (the production forms of the declared-
    # superlinear family — constant-k ANN/clustering, banded exact
    # verify, fixed-pool sampling):
    "q_llm_ann_pq_rerank_fixedk",
    "q_llm_kmeans_fixedk",
    "q_llm_semdedup_fixedk",
    "q_llm_neardup_jaccard_banded",
    "q_llm_negative_sampling_fixedpool",
    # Round-10 probe-scaled search (the recall-at-scale closers):
    "q_llm_ann_ivf_probed",
    "q_llm_ann_pq_rerank_scaled",
    # Round-11: the composed production search — multi-probe routing
    # feeding the corpus-scaled exact rerank within the probed cells
    # (cell-partitioned index, DPP-pruned scan).
    "q_llm_ann_pq_probed_scaled",
    # Round-10 second wave: DSIR selection, rank concordance, drift,
    # local-DP release, compaction planning.
    "q_llm_dsir",
    "q_ml_kendall_tau",
    "q_ts_page_hinkley",
    "q_priv_randomized_response",
    "q_lake_compaction_plan",
    "q_lake_compaction_apply",
    "q_ml_kruskal_wallis",
    "q_ts_holt_winters",
    # Round-9 second wave: exact-integer AdaBoost, one-shuffle CM
    # sketch, tolerance as-of, STL strengths.
    "q_ml_boosted_stumps",
    "q_agg_cm_join_estimate",
    "q_join_asof_tolerance",
    "q_ts_stl_strength",
    # Round-11 wave: the three new keys with corpus-scale work (the
    # bounded-rollup analytics — friedman, modularity, isotonic — cost
    # their fact scan only and ride the flagship's timing family).
    "q_llm_paragraph_dedup",
    "q_llm_ann_sq8",
    "q_fn_jaro_winkler",
    # Round-11 waves 4-7: the keys with corpus-scale work (user-keyed
    # CUPED fold, vocab-join JSD, per-source cap window, user-window
    # disorder audit, fact-to-fact temporal FK join, backbone
    # conductance, token-lambda watermark scan).
    "q_ml_cuped",
    "q_llm_jsd_sources",
    "q_llm_domain_cap",
    "q_stream_disorder_batchsem",
    "q_dq_temporal_fk",
    "q_graph_conductance",
    "q_llm_watermark_detect",
    # Round-12: the composed 6-stage curation funnel (two corpus scans
    # + the chunk-dedup exchange — the heaviest honest curation key).
    "q_llm_curation_pipeline",
    # Round-13: the stream-composed corpus refresh — a REAL availableNow
    # envelope drain + compaction + the funnel over the landed table;
    # its timing is ingest + curation end to end, the production job.
    "q_stream_curation_e2e_batchsem",
    # Round-13 wave 1/2 perf-relevant keys: the composed day-2
    # incremental refresh (two heavy reads per side), the banded
    # two-phase exact grand median (three fact passes by contract),
    # and the token-explode MATTR (the heaviest wave-2 key at 100x).
    "q_llm_corpus_refresh_incremental",
    "q_ml_mood_median",
    "q_llm_mattr",
]


def run_ingest(spark, sf_dir: str) -> dict:
    """khose's native metric: records/s through the full ingest pipeline
    (Kinesis-envelope stream -> JSON decode -> exactly-once partitioned
    parquet sink). Staging the fixture as chunk files is setup, not
    ingest — the clock starts at stream launch."""
    import shutil
    import tempfile

    from khose_spark.sources.kinesis_sim import (
        kinesis_stream,
        parse_envelope,
        stage_event_chunks,
    )
    from khose_spark.streaming.runtime import (
        checkpoint_dirs,
        compact_parquet,
        ingest_to_parquet,
    )

    chunks = stage_event_chunks(spark, sf_dir, n_chunks=8, tag="bench_ingest")
    base = tempfile.mkdtemp(prefix="khose_bench_ingest_")
    # Warm the STREAMING code path before the clocked drain (r12): the
    # first streaming query in a session pays one-time codegen/state-
    # store init that measured 2x-4x the whole steady-state drain
    # (quiet-host triple: 18.6k warming vs 42.1k/37.1k warm, recorded
    # in BENCH_DETAIL ingest_quiet_rerun). The gate tracks the DRAIN
    # path, so the warmup runs on its own 1-chunk staging + throwaway
    # sink and stays off the clock — same discipline as the headline
    # loop's first-query warmup.
    # Warmup fixture: the tiny sf0.001 events table when present (cheapest
    # possible codegen/state-store warmup), else sf_dir itself — so the
    # bench still runs on hosts that only carry the target fixture
    # (ADVICE r12: the hardcoded path aborted the whole bench there).
    warm_sf = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_sf):
        warm_sf = sf_dir
    warm_chunks = stage_event_chunks(
        spark, warm_sf, n_chunks=1, tag="bench_ingest_warm"
    )
    warm_base = tempfile.mkdtemp(prefix="khose_bench_ingest_warm_")
    warm_out, warm_ckpt = checkpoint_dirs(warm_base)
    ingest_to_parquet(
        parse_envelope(kinesis_stream(spark, warm_chunks, files_per_trigger=1)),
        warm_out,
        warm_ckpt,
        partition_granularity="month",
        coalesce_to=1,
    )
    shutil.rmtree(warm_base, ignore_errors=True)
    shutil.rmtree(warm_chunks, ignore_errors=True)
    out, ckpt = checkpoint_dirs(base)
    t0 = time.perf_counter()
    # Fixture events span ~1 month, so "month" is the rate-matched
    # partition granularity here (a day-dir would hold ~3k rows — the
    # small-files anti-pattern); coalesce(1) gives one file per
    # partition-dir per micro-batch. Production at 100 TB flips these
    # to "day" + parallel writers — same code path.
    # 4 chunk files per micro-batch: the per-batch fixed cost
    # (incremental plan + WAL + manifest commit) dominates at this
    # volume, so batching is the honest throughput knob — a real
    # Kinesis consumer does exactly this by raising its GetRecords
    # batch size. Convergence tests keep files_per_trigger=1.
    ingest_to_parquet(
        parse_envelope(kinesis_stream(spark, chunks, files_per_trigger=4)),
        out,
        ckpt,
        partition_granularity="month",
        coalesce_to=1,
    )
    dt = time.perf_counter() - t0

    def _count_files(d: str) -> int:
        return sum(1 for _, _, fs in os.walk(d) for f in fs if f.endswith(".parquet"))

    landed_files = _count_files(out)
    compacted = os.path.join(base, "compacted")
    t1 = time.perf_counter()
    compact_parquet(spark, out, compacted)
    compact_sec = time.perf_counter() - t1
    rows = spark.read.parquet(compacted).count()
    files = _count_files(compacted)
    shutil.rmtree(base, ignore_errors=True)
    shutil.rmtree(chunks, ignore_errors=True)
    return {
        "rows": rows,
        "sec": round(dt, 3),
        "rows_per_sec": round(rows / dt, 1),
        "files_landed": landed_files,
        "compact_sec": round(compact_sec, 3),
        "files_written": files,
    }


# Heavy-tail keys re-timed on the deterministic 10× materialization of
# the bench fixture (khose_spark/scaling.py): the empirical scaling
# proof behind the plan-shape arguments. Ordered cheapest-first so the
# wall-clock guard truncates the most expensive keys, not the cheapest.
SCALING_KEYS = [
    "q_llm_sentence_dedup",
    "q_llm_bpe_merges",
    "q_er_sorted_neighborhood",
    "q_llm_neardup_jaccard",
    "q_llm_minhash_det",
    "q_llm_ann_pq_indexed",
    "q_llm_containment",
    "q_llm_incremental_dedup",
    "q_llm_semdedup",
    # Round-9 fixed-k / banded twins: the empirical near-linear ratios
    # that justify retiring their sampled/all-candidate originals from
    # the scale path (originals stay above as the superlinear controls).
    "q_llm_ann_pq_indexed_fixedk",
    # Round-10 probe-scaled search: the corpus-scaled rerank pool's
    # time ratio rides next to its gated recall.
    "q_llm_ann_pq_rerank_scaled",
    # Round-11 composed routed search: ratio should track the probed
    # corpus fraction (8/64 of codes + the scaled pool).
    "q_llm_ann_pq_probed_scaled",
    "q_llm_semdedup_fixedk",
    "q_llm_neardup_jaccard_banded",
    # Round-11: paragraph-granularity dedup — the new corpus-scale
    # shuffle key; ratio should track the chunk-stream volume.
    "q_llm_paragraph_dedup",
    "q_graph_triangles",
    "q_graph_adamic_adar",
    "q_graph_labelprop",
    "q_graph_hits",
]
SCALING_FACTOR = 10
SCALING_BUDGET_SEC = 480.0

# The fixture-truth twins DECLARED superlinear at 10× (VERDICT r13
# item 8): each is kept in SCALING_KEYS deliberately, as the quadratic
# control sitting next to its banded/fixed-k production sibling
# (SURVEY §2.16; run_scaling docstring). Their ratios are real and
# expected to exceed ~1.2× the factor; the production siblings carry
# the linear contract the recall gates certify.
DECLARED_SUPERLINEAR = {
    # exact all-pairs Jaccard verifier (truth tier of the two-tier
    # pipeline; production sibling: q_llm_neardup_jaccard_banded)
    "q_llm_neardup_jaccard",
    # exact containment truth tier (sibling: q_llm_containment_banded)
    "q_llm_containment",
    # sampled k=n/50 codebook contract: assignment is n²/50 by design
    # (siblings: the fixed-k / probed-scaled family)
    "q_llm_ann_pq_indexed",
    # fixed-k clustering contract: 10× the corpus in the same 64
    # clusters makes the within-cluster pair scan quadratic
    # (production scales k with the corpus; sibling: semdedup_fixedk)
    "q_llm_semdedup",
}


def run_scaling(spark, sf_dir: str) -> dict:
    """Time SCALING_KEYS at 1× and 10× volume and report the ratio.

    Both sides run against freshly GENERATED dirs (factor=1 and
    factor=10 of ``sf_dir``) so they share file layout, parquet
    encoding, and cold per-dir memo state (the graph backbone / PQ
    index caches are keyed per dir) — the ratio then measures the
    query, not warm-cache asymmetry. Superlinear ratios (>~1.2×factor)
    are the signal the plan gates can't see; q_llm_semdedup is the one
    key documented to exceed it (fixed-k clustering contract: 10× the
    corpus in the same k clusters makes the within-cluster pair scan
    quadratic; production scales k with the corpus)."""
    import shutil

    from khose_spark.scaling import ensure_scale_dir

    # dest is keyed by the base fixture name so a bench run at another
    # SF never reuses a stale materialization
    tag = os.path.basename(sf_dir.rstrip("/"))
    base = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/khose_scale") + f"_{tag}"
    t0 = time.perf_counter()
    one = ensure_scale_dir(spark, sf_dir, base + "_x1", factor=1)
    big = ensure_scale_dir(
        spark, sf_dir, base + f"_x{SCALING_FACTOR}", factor=SCALING_FACTOR
    )
    setup_sec = time.perf_counter() - t0
    keys: dict[str, dict] = {}
    start = time.perf_counter()
    truncated = False
    for name in SCALING_KEYS:
        if name not in registry.QUERIES:
            continue
        if time.perf_counter() - start > SCALING_BUDGET_SEC:
            truncated = True
            break
        t1 = time.perf_counter()
        registry.QUERIES[name](spark, one).count()
        sec_1x = time.perf_counter() - t1
        t1 = time.perf_counter()
        registry.QUERIES[name](spark, big).count()
        sec_10x = time.perf_counter() - t1
        keys[name] = {
            "sec_1x": round(sec_1x, 3),
            "sec_10x": round(sec_10x, 3),
            "ratio": round(sec_10x / sec_1x, 2) if sec_1x > 0 else None,
        }
        print(f"# scaling {name}: {sec_1x:.3f}s -> {sec_10x:.3f}s", file=sys.stderr)
    out = {"factor": SCALING_FACTOR, "setup_sec": round(setup_sec, 3), "keys": keys}
    if truncated:
        out["truncated"] = True  # budget hit; remaining keys dropped
    try:
        # Both scales, for an honest delta. Geometry note (measured r07):
        # the fixture embeddings are random-ish, so pairwise distances
        # concentrate — ANY lossy quantizer (PQ ADC, IVF probe-1) has
        # near-zero/partial top-3 agreement with exact search even at 1×
        # (PQ 0‰ @1× / 133‰ @10×, IVF 267‰ → 200‰), while the tiers
        # whose FINAL ranking is exact hold (two-tier 1000‰ at both
        # scales). The hash-checked oracles certify the index MECHANISM;
        # recall on real (clustered) embeddings is a property of the
        # data, not the plan.
        for label, rdir in (("recall_1x", one), ("recall_10x", big)):
            # Per-scale wrap (ADVICE r07): a failure on the 1× dir must
            # be recorded under recall_1x, not mislabeled as the 10×'s.
            try:
                out[label] = run_ann_recall(spark, rdir)
            except Exception as exc:  # noqa: BLE001 — evidence, not a gate
                out[label] = {
                    "error": f"{type(exc).__name__}: {exc}",
                    "dir": rdir,
                }
        print(
            f"# recall 1x: {out['recall_1x']} 10x: {out['recall_10x']}",
            file=sys.stderr,
        )
        # The dispositive geometry experiment (VERDICT r07 item 4): the
        # same IVF/PQ mechanisms measured on the CLUSTERED embedding
        # twin, where "top-3 neighbors" is a quantizer-resolvable
        # notion. High recall here + low recall on the random fixture
        # = the fixture's distance concentration, not the plan.
        try:
            from khose_spark.scaling import ensure_clustered_dir

            cdir = ensure_clustered_dir(
                spark, sf_dir, base + "_clustered"
            )
            out["recall_clustered_1x"] = run_ann_recall(spark, cdir)
            print(
                f"# recall clustered: {out['recall_clustered_1x']}",
                file=sys.stderr,
            )
            # Round 11 (VERDICT r10 item 1): the routed-production gate
            # lives at CLUSTERED 10x — the composed probed+scaled key
            # must be recall-strong where routing is resolvable AND at
            # scale. Subset mode: only the three routed/scaled keys, so
            # this fixture costs three searches, not the full ladder.
        except Exception as exc:  # noqa: BLE001
            out["recall_clustered_1x"] = {
                "error": f"{type(exc).__name__}: {exc}"
            }
        try:
            from khose_spark.scaling import ensure_clustered_dir

            cdir10 = ensure_clustered_dir(
                spark, big, base + "_clustered_x10"
            )
            out["recall_clustered_10x"] = run_ann_recall(
                spark,
                cdir10,
                only={
                    "q_llm_ann_ivf_probed",
                    "q_llm_ann_pq_rerank_scaled",
                    "q_llm_ann_pq_probed_scaled",
                },
            )
            print(
                f"# recall clustered 10x: {out['recall_clustered_10x']}",
                file=sys.stderr,
            )
        except Exception as exc:  # noqa: BLE001
            out["recall_clustered_10x"] = {
                "error": f"{type(exc).__name__}: {exc}"
            }
        # Round 13 (VERDICT r12 item 6): the saturated 1000-permille
        # clustered-10x gate has no drift signal, so the routed search
        # is ALSO gated on a HARD clustered twin — same manifold
        # geometry, isotropic noise raised 0.03 -> 0.33, tuned so the
        # composed probed+scaled search sits mid-band (933 permille
        # measured at registration; the transition is steep: 0.32 ->
        # 967, 0.35 -> 900, 0.45 -> 633). The fixture is md5-determined
        # and the engine deterministic, so any movement in this number
        # is an engine change, not flake.
        try:
            from khose_spark.scaling import ensure_clustered_dir

            cdir10h = ensure_clustered_dir(
                spark,
                big,
                base + "_clustered_hard_x10",
                noise=HARD_TWIN_NOISE,
            )
            out["recall_clustered_hard_10x"] = run_ann_recall(
                spark,
                cdir10h,
                only={
                    "q_llm_ann_ivf_probed",
                    "q_llm_ann_pq_rerank_scaled",
                    "q_llm_ann_pq_probed_scaled",
                },
            )
            print(
                "# recall clustered hard 10x: "
                f"{out['recall_clustered_hard_10x']}",
                file=sys.stderr,
            )
        except Exception as exc:  # noqa: BLE001
            out["recall_clustered_hard_10x"] = {
                "error": f"{type(exc).__name__}: {exc}"
            }
    except Exception as exc:  # noqa: BLE001 — recall is evidence, not a gate
        out["recall_error"] = f"{type(exc).__name__}: {exc}"
    if os.environ.get("SPARK_GRAFT_SCALE_KEEP", "1") != "1":
        shutil.rmtree(base + "_x1", ignore_errors=True)
        shutil.rmtree(base + f"_x{SCALING_FACTOR}", ignore_errors=True)
        shutil.rmtree(base + "_clustered", ignore_errors=True)
        shutil.rmtree(base + "_clustered_x10", ignore_errors=True)
        shutil.rmtree(base + "_clustered_hard_x10", ignore_errors=True)
    return out


def run_ann_recall(spark, big_dir: str, only: set | None = None) -> dict:
    """ANN recall on the 10× corpus (VERDICT r06 item 6): the sf0.1
    recall figures were measured where neighbor geometry is the base
    fixture's; the decorrelated 10× corpus has different cell/bucket
    occupancy, so recall is re-derived here against exact ground truth.

    Ground truth is brute force on the driver (20k×64 doubles ≈ 10 MB —
    measurement code, not the scale path): per method's OWN metric,
    cosine for IVF (it ranks by cosine in-cell) and full-precision L2²
    for PQ (ADC-vs-exact is the standard PQ recall definition). The
    two-tier near-dup recall comes from running the registered
    q_llm_lsh_recall_audit key on the 10× dir (its own exact tier is
    the ground truth there)."""
    import numpy as np

    rows = (
        spark.read.parquet(os.path.join(big_dir, "embeddings.parquet"))
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    qmask = ids < 10
    qids, qmat = ids[qmask], mat[qmask]
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)

    def exact_top3(scores_fn, better_desc: bool) -> dict[int, set[int]]:
        out: dict[int, set[int]] = {}
        for qi, qid in enumerate(qids):
            s = scores_fn(qi)
            mask = ids != qid
            cand, cs = ids[mask], s[mask]
            key = np.lexsort((cand, -cs if better_desc else cs))
            out[int(qid)] = {int(x) for x in cand[key[:3]]}
        return out

    # same rounding as the engine's ranking (round(...,4) + id tiebreak)
    exact_cos = exact_top3(lambda qi: np.round(qn[qi] @ matn.T, 4), True)
    exact_l2 = exact_top3(
        lambda qi: np.round(((mat - qmat[qi]) ** 2).sum(axis=1), 4), False
    )

    def recall_permille(key: str, truth: dict[int, set[int]]) -> int:
        got: dict[int, set[int]] = {}
        for r in registry.QUERIES[key](spark, big_dir).collect():
            got.setdefault(int(r["qid"]), set()).add(int(r["neighbor_id"]))
        hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
        total = sum(len(t) for t in truth.values())
        return round(1000 * hits / total) if total else None

    if only is not None:
        # Subset mode (the clustered-10x routed-gate measurement): run
        # only the named keys so the extra fixture doesn't multiply the
        # whole ANN ladder's wall-clock.
        subset = {
            "ann_ivf_probed_r3_permille": ("q_llm_ann_ivf_probed", exact_cos),
            "ann_pq_rerank_scaled_r3_permille": (
                "q_llm_ann_pq_rerank_scaled", exact_l2),
            "ann_pq_probed_scaled_r3_permille": (
                "q_llm_ann_pq_probed_scaled", exact_l2),
        }
        return {
            label: recall_permille(key, truth)
            for label, (key, truth) in subset.items()
            if key in only
        }

    out = {
        "ann_ivf_r3_permille": recall_permille("q_llm_ann_ivf", exact_cos),
        "ann_pq_r3_permille": recall_permille(
            "q_llm_ann_pq_indexed", exact_l2
        ),
        # IVFPQ+R (round 8): same codes, top-10 ADC pool re-ranked by
        # exact L2^2 — measures what the refinement stage buys back
        # from the quantizer's cell distortion.
        "ann_pq_rerank_r3_permille": recall_permille(
            "q_llm_ann_pq_rerank", exact_l2
        ),
        # Fixed-k twins (round 9): the constant-64-seed production
        # contracts — recall tracked per round next to the sampled
        # forms so the codebook-size trade is a measured quantity.
        "ann_ivf_fixedk_r3_permille": recall_permille(
            "q_llm_ann_ivf_fixedk", exact_cos
        ),
        "ann_pq_fixedk_r3_permille": recall_permille(
            "q_llm_ann_pq_indexed_fixedk", exact_l2
        ),
        "ann_pq_rerank_fixedk_r3_permille": recall_permille(
            "q_llm_ann_pq_rerank_fixedk", exact_l2
        ),
        # Round 10: the probe-scaled forms that close VERDICT r09's
        # `weak` — multi-probe routing and the corpus-scaled (R=2n/25)
        # refinement pool. The scaled rerank is the GATED one (733‰
        # floor at 10×, enforced by recall_gate below).
        "ann_ivf_probed_r3_permille": recall_permille(
            "q_llm_ann_ivf_probed", exact_cos
        ),
        "ann_pq_rerank_scaled_r3_permille": recall_permille(
            "q_llm_ann_pq_rerank_scaled", exact_l2
        ),
        # Round 11: the composed key — probe-8 routing feeding the
        # corpus-scaled rerank within the probed cells. On decorrelated
        # fixtures this is bounded by routing recall (documented); the
        # GATED number is its clustered-10x entry (recall_gate_routed).
        "ann_pq_probed_scaled_r3_permille": recall_permille(
            "q_llm_ann_pq_probed_scaled", exact_l2
        ),
    }
    audit = registry.QUERIES["q_llm_lsh_recall_audit"](spark, big_dir).collect()
    if audit:
        out["two_tier_recall_permille"] = int(audit[0]["recall_permille"])
    # Containment recall (round 10, VERDICT r09 item 4): the banded
    # containment twin's declared residual risk (tiny-inside-huge
    # asymmetric pairs) measured per round, same audit pattern.
    caudit = registry.QUERIES["q_llm_containment_recall_audit"](
        spark, big_dir
    ).collect()
    if caudit:
        out["containment_recall_permille"] = int(
            caudit[0]["recall_permille"]
        )
    return out


def _bench_files_newest_first() -> list[str]:
    """BENCH_r*.json paths sorted by PARSED round number, newest first
    (ADVICE r09 item 2: a reverse lexicographic sort of the raw name
    breaks at round 100 — 'BENCH_r99' sorts after 'BENCH_r100' — which
    would silently compare gates against stale rounds)."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))

    def round_no(p: str) -> int:
        m = re.search(r"BENCH_r(\d+)\.json$", os.path.basename(p))
        return int(m.group(1)) if m else -1

    return sorted(
        glob.glob(os.path.join(here, "BENCH_r*.json")),
        key=round_no,
        reverse=True,
    )


def _prev_bench_queries(n: int = 2) -> list[tuple[str, dict[str, float]]]:
    """Per-key timings from the newest ``n`` PARSEABLE BENCH_r*.json
    records (compact lines carry every key above the noise floor;
    '_'-prefixed entries are subtotals, not queries)."""
    out: list[tuple[str, dict[str, float]]] = []
    for p in _bench_files_newest_first():
        try:
            doc = json.load(open(p))
            body = doc if doc.get("queries") else (doc.get("parsed") or {})
            q = body.get("queries") or {}
            sf = body.get("sf")
        except (OSError, ValueError, AttributeError):
            continue
        q = {
            k: float(v)
            for k, v in q.items()
            if not k.startswith("_") and isinstance(v, (int, float))
        }
        if q:
            out.append((os.path.basename(p), q, sf))
        if len(out) == n:
            break
    return out


def regression_gate(spark, sf_dir: str, timings: dict[str, float], sf) -> dict:
    """Per-key bench regression gate (VERDICT r06 item 3) — encode the
    ±40% host-noise folklore instead of eyeballing it.

    Offense = common-set total >1.4× the newest parseable round, OR any
    single key >2× its trailing-two-round minimum (1 s absolute floor —
    sub-second keys swing multiples on host noise alone). Each offender
    gets ONE interleaved re-run (min of the two measurements replaces
    the timing — a noise spike must reproduce to fail); if a breach
    survives the re-run, the offenders are printed and bench exits
    nonzero. Thresholds documented in BASELINE.md."""
    prev = [
        (name, q) for name, q, psf in _prev_bench_queries(2) if psf == sf
    ]
    if not prev:
        # Recorded rounds are at a different SF (e.g. a local sf0.001
        # dev run vs the driver's sf0.1 records) — cross-scale timing
        # comparisons are meaningless, so the gate stands down.
        return {"ok": True, "reason": f"no prior parseable round at sf={sf}"}

    def _offenders() -> dict[str, dict]:
        bad: dict[str, dict] = {}
        for k, v in timings.items():
            hist = [q[k] for _, q in prev if k in q]
            if hist and v > 2 * min(hist) and v > 1.0:
                bad[k] = {"sec": v, "prev_min": round(min(hist), 3)}
        return bad

    def _total_breach():
        common = common_with_prev(timings)
        # prev_file must be the sf-matched newest round (common_with_prev
        # itself has no sf filter).
        if (
            common
            and common["prev_file"] == prev[0][0]
            and common["sec"] > 1.4 * common["prev_sec"]
        ):
            return common
        return None

    bad, total_bad = _offenders(), _total_breach()
    if not bad and not total_bad:
        return {"ok": True}

    # One interleaved re-run: per-key offenders, plus (on a total
    # breach) every common key that grew >1.4× and costs >0.5 s.
    rerun = set(bad)
    if total_bad:
        newest = prev[0][1]
        rerun |= {
            k
            for k, v in timings.items()
            if k in newest and v > 1.4 * newest[k] and v > 0.5
        }
    for k in sorted(rerun):
        t0 = time.perf_counter()
        registry.QUERIES[k](spark, sf_dir).count()
        dt = time.perf_counter() - t0
        print(f"# rerun {k}: {timings[k]:.3f}s -> {dt:.3f}s", file=sys.stderr)
        timings[k] = round(min(timings[k], dt), 3)

    bad, total_bad = _offenders(), _total_breach()
    result = {
        "ok": not bad and not total_bad,
        "reran": sorted(rerun),
        "per_key_offenders": bad,
    }
    if total_bad:
        result["total_breach"] = total_bad
    if not result["ok"]:
        print(
            "# REGRESSION GATE FAILED: "
            + json.dumps({"per_key": bad, "total": total_bad}),
            file=sys.stderr,
        )
    return result


RECALL_FLOOR_PERMILLE = 733  # the sampled n/50-codebook contract's
# IVFPQ+R top-3 recall at 10× (BENCH_r09) — the bar the scale-linear
# form must clear for the fixed-k family to be `done`, not `weak`.


def recall_gate(scaling) -> dict:
    """ANN recall gate (VERDICT r09 item 1: 'recall becomes a gated
    metric, not a printout'): the corpus-scaled IVFPQ+R rerank
    (q_llm_ann_pq_rerank_scaled) must hold ≥733‰ top-3 recall on the
    decorrelated 10× corpus — the recall the SAMPLED (superlinear)
    contract achieved — or the bench exits non-zero like any other
    regression."""
    if not scaling:
        return {"ok": True, "reason": "scaling report skipped"}
    rec = scaling.get("recall_10x") or {}
    val = rec.get("ann_pq_rerank_scaled_r3_permille")
    if not isinstance(val, int):
        return {
            "ok": True,
            "reason": "no 10x recall measurement in this run",
        }
    gate = {
        "ok": val >= RECALL_FLOOR_PERMILLE,
        "floor_permille": RECALL_FLOOR_PERMILLE,
        "measured_permille": val,
        "key": "q_llm_ann_pq_rerank_scaled",
    }
    if not gate["ok"]:
        print("# RECALL GATE FAILED: " + json.dumps(gate), file=sys.stderr)
    return gate


HARD_TWIN_NOISE = 0.33  # the round-13 hard clustered twin's isotropic
# noise level — tuned (see run_scaling) so the routed search's recall
# is NON-SATURATED: 933 permille at registration, mid the 900-970 band
# VERDICT r12 item 6 asked for, where drift is visible per-neighbor.

HARD_ROUTED_RECALL_FLOOR_PERMILLE = 866  # = registration 933 minus two
# ground-truth neighbors (30 pairs -> 33 permille each): one lost
# neighbor is VISIBLE in the recorded number but tolerated, two fail
# the bench. Deterministic fixture + engine => a move is a real
# routing/rerank change, never flake.


def recall_gate_routed_hard(scaling) -> dict:
    """Third recall gate (round 13, VERDICT r12 item 6): the composed
    probed+scaled search on the HARD clustered 10x twin (noise 0.33)
    must hold >=866 permille top-3 recall. Unlike the saturated
    clustered gate (1000 permille — no drift signal), this fixture is
    tuned so the measurement sits mid-band (933 at registration) and
    every lost neighbor moves it by 33."""
    if not scaling:
        return {"ok": True, "reason": "scaling report skipped"}
    rec = scaling.get("recall_clustered_hard_10x") or {}
    val = rec.get("ann_pq_probed_scaled_r3_permille")
    if not isinstance(val, int):
        return {
            "ok": True,
            "reason": "no hard-clustered-10x recall measurement in this run",
        }
    gate = {
        "ok": val >= HARD_ROUTED_RECALL_FLOOR_PERMILLE,
        "floor_permille": HARD_ROUTED_RECALL_FLOOR_PERMILLE,
        "measured_permille": val,
        "registration_permille": 933,
        "key": "q_llm_ann_pq_probed_scaled",
        "fixture": f"clustered_hard_10x (noise={HARD_TWIN_NOISE})",
    }
    if not gate["ok"]:
        print(
            "# HARD ROUTED RECALL GATE FAILED: " + json.dumps(gate),
            file=sys.stderr,
        )
    return gate


ROUTED_RECALL_FLOOR_PERMILLE = 900  # VERDICT r10 item 1's bar for the
# composed production search. Gated on the CLUSTERED 10x corpus: cell
# routing is information-limited on decorrelated data (any sublinear
# reader is), so the routed gate holds where neighbor geometry is
# quantizer-resolvable — the case real embeddings present — while the
# UNROUTED scaled rerank keeps the decorrelated-10x gate above.


def recall_gate_routed(scaling) -> dict:
    """Second recall gate (round 11): the composed probed+scaled search
    (q_llm_ann_pq_probed_scaled) must hold >=900 permille top-3 recall
    on the CLUSTERED 10x corpus, or bench exits non-zero."""
    if not scaling:
        return {"ok": True, "reason": "scaling report skipped"}
    rec = scaling.get("recall_clustered_10x") or {}
    val = rec.get("ann_pq_probed_scaled_r3_permille")
    if not isinstance(val, int):
        return {
            "ok": True,
            "reason": "no clustered-10x recall measurement in this run",
        }
    gate = {
        "ok": val >= ROUTED_RECALL_FLOOR_PERMILLE,
        "floor_permille": ROUTED_RECALL_FLOOR_PERMILLE,
        "measured_permille": val,
        "key": "q_llm_ann_pq_probed_scaled",
        "fixture": "clustered_10x",
    }
    if not gate["ok"]:
        print(
            "# ROUTED RECALL GATE FAILED: " + json.dumps(gate),
            file=sys.stderr,
        )
    return gate


def _prev_ingest_rates(n: int = 2, want_sf=None) -> list[float]:
    """ingest rows/s from the newest ``n`` parseable BENCH_r*.json
    records at the matching sf (compact lines carry
    ``ingest_rows_per_sec``)."""
    out: list[float] = []
    for p in _bench_files_newest_first():
        try:
            doc = json.load(open(p))
            body = doc if doc.get("queries") else (doc.get("parsed") or {})
            rate = body.get("ingest_rows_per_sec")
            sf = body.get("sf")
        except (OSError, ValueError, AttributeError):
            continue
        if isinstance(rate, (int, float)) and (want_sf is None or sf == want_sf):
            out.append(float(rate))
        if len(out) == n:
            break
    return out


def ingest_gate(spark, sf_dir: str, ing: dict, sf) -> tuple[dict, dict]:
    """Ingest regression gate (VERDICT r08 item 5) — the queries' 40%
    interleaved-rerun rule applied to the one metric that had none:
    if rows/s falls below 0.6× the trailing-two-round MAX at the same
    sf, re-run ingest once and keep the better measurement (a noise
    spike must reproduce to count). Returns (gate_record, ing) — ing is
    replaced by the re-run when the re-run is faster."""
    prev = _prev_ingest_rates(2, want_sf=sf)
    if not prev:
        return {"ok": True, "reason": f"no prior ingest record at sf={sf}"}, ing
    floor = 0.6 * max(prev)
    if ing["rows_per_sec"] >= floor:
        return {"ok": True, "prev_max": max(prev)}, ing
    print(
        f"# ingest gate: {ing['rows_per_sec']} < 0.6*{max(prev)} — re-running",
        file=sys.stderr,
    )
    second = run_ingest(spark, sf_dir)
    best = second if second["rows_per_sec"] > ing["rows_per_sec"] else ing
    gate = {
        "ok": best["rows_per_sec"] >= floor,
        "prev_max": max(prev),
        "first_rows_per_sec": ing["rows_per_sec"],
        "rerun_rows_per_sec": second["rows_per_sec"],
    }
    if not gate["ok"]:
        print(
            "# INGEST GATE FAILED: " + json.dumps(gate), file=sys.stderr
        )
    return gate, best


def _prev_ingest10_rates(want_sf=None) -> list[float]:
    """Trailing 10x ingest rates (VERDICT r10 item 6): the committed
    BENCH_DETAIL.json on disk is LAST round's full payload when this
    runs (main reads it before overwriting); its measured ingest_10x
    rate plus the trailing max its own gate carried forward give a
    two-round memory without inventing a new artifact. sf-matched like
    every other trailing comparison — a local sf0.001 dev run must not
    set (or consume) the sf0.1 floor."""
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        doc = json.load(open(os.path.join(here, "BENCH_DETAIL.json")))
    except (OSError, ValueError):
        return []
    if want_sf is not None and doc.get("sf") != want_sf:
        return []
    out: list[float] = []
    rate = (doc.get("ingest_10x") or {}).get("rows_per_sec")
    if isinstance(rate, (int, float)):
        out.append(float(rate))
    prev_max = (doc.get("ingest_gate_10x") or {}).get("prev_max")
    if isinstance(prev_max, (int, float)):
        out.append(float(prev_max))
    return out


def ingest_gate_10x(spark, ten_x_dir: str, ing10, sf=None) -> tuple[dict, dict]:
    """The sf0.1 ingest gate's 0.6x-trailing-max rule applied at 10x
    (VERDICT r10 item 6) — the rate was measured-but-ungated there, so
    an ingest-path regression could hide at the scale that matters.
    Same protocol: one re-run on breach, keep the better measurement."""
    if not isinstance(ing10, dict) or "rows_per_sec" not in ing10:
        return {"ok": True, "reason": "no 10x ingest measurement"}, ing10
    prev = _prev_ingest10_rates(want_sf=sf)
    if not prev:
        return {"ok": True, "reason": "no prior 10x ingest record"}, ing10
    floor = 0.6 * max(prev)
    if ing10["rows_per_sec"] >= floor:
        return {"ok": True, "prev_max": max(prev)}, ing10
    print(
        f"# ingest 10x gate: {ing10['rows_per_sec']} < 0.6*{max(prev)}"
        " — re-running",
        file=sys.stderr,
    )
    second = run_ingest(spark, ten_x_dir)
    best = second if second["rows_per_sec"] > ing10["rows_per_sec"] else ing10
    gate = {
        "ok": best["rows_per_sec"] >= floor,
        "prev_max": max(prev),
        "first_rows_per_sec": ing10["rows_per_sec"],
        "rerun_rows_per_sec": second["rows_per_sec"],
    }
    if not gate["ok"]:
        print(
            "# INGEST 10x GATE FAILED: " + json.dumps(gate), file=sys.stderr
        )
    return gate, best


# Indexed-ANN lifecycle: build step -> the registered SEARCH keys that
# read its tables (VERDICT r11 item 2). Builds are timed first-touch and
# separately; the per-key headline numbers then measure search only.
ANN_LIFECYCLE = [
    (
        "pq_sampled",
        "khose_spark.operators.similarity",
        "build_pq_index",
        ["q_llm_ann_pq_indexed", "q_llm_ann_pq_rerank"],
    ),
    (
        "pq_fixedk",
        "khose_spark.operators.similarity_fixedk",
        "build_pq_index_fixedk",
        [
            "q_llm_ann_pq_indexed_fixedk",
            "q_llm_ann_pq_rerank_fixedk",
            "q_llm_ann_pq_rerank_scaled",
        ],
    ),
    (
        "ivfpq_fixedk",
        "khose_spark.operators.similarity_fixedk",
        "build_ivfpq_index_fixedk",
        ["q_llm_ann_pq_probed_scaled"],
    ),
]


# Dedup-family memo lifecycle (VERDICT r13 item 2 — the ann_lifecycle
# pattern applied to the shared shingle/signature checkpoints): build
# and time the session memos up front so the per-key headline numbers
# for their consumers measure the CONSUMER only. In r13 the family's
# first consumer in bench order (q_llm_simhash) carried the ~2.5 s
# doc_shingles build inside its timed region, which kept totals honest
# but skewed per-key attribution and would trip the per-key regression
# gate if bench ordering around the family ever changed. The build cost
# stays visible: timed here, printed to stderr, and recorded in the
# payload's shingle_lifecycle block (old r13 per-key numbers are kept
# in BENCH_r13.json / OPTIMIZATION_r13.md).
SHINGLE_LIFECYCLE = [
    (
        "doc_shingles",
        "khose_spark.operators.llm",
        "doc_shingles",
        [
            "q_llm_exact_dedup",
            "q_llm_neardup_jaccard",
            "q_llm_minhash_lsh",
            "q_llm_neardup_two_tier",
            "q_llm_lsh_recall_audit",
            "q_llm_bloom_prefilter",
            "q_llm_minhash_estimator_audit",
            "q_llm_neardup_jaccard_banded",
            "q_llm_containment_banded",
            "q_llm_containment_recall_audit",
            "q_llm_containment",
            "q_llm_simhash",
        ],
    ),
    (
        "minhash_signatures",
        "khose_spark.operators.dedup_audit",
        "_det_signatures",
        [
            "q_llm_minhash_det",
            "q_llm_lsh_recall_audit",
            "q_llm_incremental_dedup",
            "q_llm_lsh_threshold_sweep",
            "q_llm_minhash_estimator_audit",
            "q_llm_dedup_funnel",
            "q_llm_band_occupancy",
            "q_llm_neardup_jaccard_banded",
            "q_llm_containment_banded",
            "q_llm_containment_recall_audit",
        ],
    ),
]


def run_ann_lifecycle(
    spark, sf_dir: str, names: list[str], lifecycle=ANN_LIFECYCLE
) -> dict:
    """Time each index build once (first touch populates the session
    cache keyed on (applicationId, sf_dir)); return per-build seconds
    plus the search keys whose headline timings are therefore
    search-only. Builds whose search keys aren't in this run are
    skipped — no wasted writes on --all subsets or dev key lists."""
    import importlib

    out: dict[str, dict] = {}
    wanted = set(names)
    for label, mod_name, fn_name, search_keys in lifecycle:
        if not wanted & set(search_keys):
            continue
        fn = getattr(importlib.import_module(mod_name), fn_name)
        t0 = time.perf_counter()
        fn(spark, sf_dir)
        dt = round(time.perf_counter() - t0, 3)
        out[label] = {"build_sec": dt, "search_keys": search_keys}
        print(f"# ann build {label}: {dt:.3f}s", file=sys.stderr)
    return out


def _family(name: str) -> str:
    """Bucket a query key into its operator family (q_<fam>_...)."""
    parts = name.split("_")
    return parts[1] if len(parts) > 1 else name


def common_with_prev(timings: dict[str, float]) -> dict | None:
    """Round-over-round comparability (round-4 verdict nit): subtotal
    this run over the intersection with the NEWEST BENCH_r*.json on
    disk, next to the same subtotal from that file — so a changed suite
    composition can't masquerade as a perf regression/win."""
    prev, prev_file = {}, None
    # newest PARSEABLE round wins: a round whose stdout overflowed the
    # driver's capture is recorded with parsed=null (r05) — skip it.
    # Round-number sort (ADVICE r09 item 2), not raw-filename sort.
    for prev_file in _bench_files_newest_first():
        try:
            doc = json.load(open(prev_file))
            prev = (
                doc.get("queries")
                or (doc.get("parsed") or {}).get("queries")
                or {}
            )
        except (OSError, ValueError, AttributeError):
            prev = {}
        if prev:
            break
    # "_"-prefixed entries are compact-line subtotals, not queries
    common = sorted(
        k for k in set(prev) & set(timings) if not k.startswith("_")
    )
    if not common:
        return None
    return {
        "prev_file": os.path.basename(prev_file),
        "n_queries": len(common),
        "sec": round(sum(timings[k] for k in common), 3),
        "prev_sec": round(sum(float(prev[k]) for k in common), 3),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    registry.load_all()
    spark = get_spark("khose-bench")

    if "--ingest" in sys.argv:  # standalone ingest-throughput mode
        ing = run_ingest(spark, sf_dir)
        print(f"# ingest: {ing}", file=sys.stderr)
        print(
            json.dumps(
                {
                    "metric": "ingest_rows_per_sec",
                    "value": ing["rows_per_sec"],
                    "unit": "rows/sec",
                    "queries": {"ingest_drain_sec": ing["sec"]},
                    "ingest": ing,
                    "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                }
            )
        )
        spark.stop()
        return

    if "--all" in sys.argv:  # full sweep: every registered query
        names = sorted(registry.QUERIES)
    else:
        names = [n for n in HEADLINE if n in registry.QUERIES]
    timings: dict[str, float] = {}
    # Warm the JVM + parquet footers once so per-query numbers measure the
    # plan, not session startup.
    registry.QUERIES[names[0]](spark, sf_dir).count()

    # VERDICT r11 item 2: run the one-time ANN index BUILDS up front and
    # time them separately, so the headline timings for the indexed-ANN
    # keys measure the SEARCH path only (their session index cache is
    # hot by the time the loop reaches them) and the regression gate
    # gates the search number — a genuine search regression can no
    # longer hide inside build noise, and the build cost is recorded.
    ann_lifecycle = run_ann_lifecycle(spark, sf_dir, names)

    # r14 (VERDICT r13 item 2): same treatment for the dedup family's
    # shared shingle/signature memo builds — timed up front as their
    # own recorded lines so consumer keys measure search/consume only.
    shingle_lifecycle = run_ann_lifecycle(
        spark, sf_dir, names, lifecycle=SHINGLE_LIFECYCLE
    )

    total = 0.0
    for name in names:
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s rows={n}", file=sys.stderr)

    # Regression gate BEFORE the ingest/scaling extras: offenders get
    # their interleaved re-run while the session state matches the
    # original measurement as closely as possible.
    gate = regression_gate(
        spark,
        sf_dir,
        timings,
        float(sf) if sf.replace(".", "").isdigit() else sf,
    )
    total = sum(timings.values())  # re-runs may have lowered timings

    # r14 (VERDICT r13 items 1-2, guide §5): the headline loop and the
    # gate's re-runs are done with the session memos — unpersist their
    # checkpoint blocks NOW so the ingest/scaling extras below start
    # from a clean storage footprint (the 10x block would otherwise
    # stack a second corpus's memos on top of these via its own sf_dir).
    from khose_spark import memo as _memo

    _memo.release_all()

    # khose's own axis — records/s through the streaming ingest pipeline —
    # rides along in the same single JSON line (contract: ONE line).
    ing = run_ingest(spark, sf_dir)
    print(f"# ingest: {ing}", file=sys.stderr)
    ing_gate, ing = ingest_gate(
        spark,
        sf_dir,
        ing,
        float(sf) if sf.replace(".", "").isdigit() else sf,
    )

    # 10× ingest (VERDICT r07 item 5): the same pipeline over the 10×
    # events materialization when it's on disk — throughput evidence at
    # ~1M rows, recorded in BENCH_DETAIL next to the soak's assertions.
    ing10 = None
    tag = os.path.basename(sf_dir.rstrip("/"))
    ten_x = (
        os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/khose_scale")
        + f"_{tag}_x10"
    )
    ing10_gate = None
    if os.path.exists(os.path.join(ten_x, "_SCALED_x10_OK")):
        try:
            ing10 = run_ingest(spark, ten_x)
            print(f"# ingest 10x: {ing10}", file=sys.stderr)
            ing10_gate, ing10 = ingest_gate_10x(
                spark,
                ten_x,
                ing10,
                sf=float(sf) if sf.replace(".", "").isdigit() else sf,
            )
        except Exception as exc:  # noqa: BLE001 — evidence until gated
            ing10 = {"error": f"{type(exc).__name__}: {exc}"}

    # 10× scaling proof for the heavy tail (skippable for quick local
    # iterations: SPARK_GRAFT_SCALING=0).
    scaling = None
    if os.environ.get("SPARK_GRAFT_SCALING", "1") == "1" and "--all" not in sys.argv:
        scaling = run_scaling(spark, sf_dir)

    families: dict[str, float] = {}
    for name, dt in timings.items():
        fam = _family(name)
        families[fam] = round(families.get(fam, 0.0) + dt, 3)

    payload = {
        "metric": "full_suite_total" if "--all" in sys.argv else "headline_suite_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "families": families,
        "ingest": ing,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if ann_lifecycle:
        # Attach the measured search-only seconds next to each build so
        # the lifecycle reads as one block: build once, search many.
        for blk in ann_lifecycle.values():
            blk["search_sec"] = {
                k: timings[k] for k in blk["search_keys"] if k in timings
            }
        payload["ann_lifecycle"] = ann_lifecycle
    if shingle_lifecycle:
        for blk in shingle_lifecycle.values():
            blk["consumer_sec"] = {
                k: timings[k] for k in blk["search_keys"] if k in timings
            }
        payload["shingle_lifecycle"] = shingle_lifecycle
    if ing10 is not None:
        payload["ingest_10x"] = ing10
    if scaling is not None:
        payload["scaling"] = scaling
    payload["regression_gate"] = gate
    payload["ingest_gate"] = ing_gate
    if ing10_gate is not None:
        payload["ingest_gate_10x"] = ing10_gate
    rec_gate = recall_gate(scaling)
    payload["recall_gate"] = rec_gate
    routed_gate = recall_gate_routed(scaling)
    payload["recall_gate_routed"] = routed_gate
    routed_hard_gate = recall_gate_routed_hard(scaling)
    payload["recall_gate_routed_hard"] = routed_hard_gate
    common = common_with_prev(timings)
    if common is not None:
        payload["common_with_prev"] = common

    # The driver records only the LAST ~2000 chars of stdout and parses
    # the JSON line out of that tail — round 5's full payload overflowed
    # it and was recorded unparsed. So: FULL payload goes to a committed
    # sidecar (BENCH_DETAIL.json), stdout gets a compact line that is
    # guaranteed to fit — per-query timings at 1 decimal for every query
    # above an adaptive threshold, the noise-floor rest as one subtotal.
    here = os.path.dirname(os.path.abspath(__file__))
    detail_path = os.path.join(here, "BENCH_DETAIL.json")
    # Scale guard (r13): BENCH_DETAIL.json is the ROUND artifact — the
    # trailing-record memory the sf-matched gates read next round
    # (ingest_gate_10x lost r12's 72.8k-rows/s 10x record to two
    # sf0.001 dev smokes that clobbered the sidecar before the real
    # sf0.1 run). A run at any other sf keeps its full payload in a
    # dev-scratch sidecar instead; the committed artifact only ever
    # holds the graded scale.
    committed_sf = None
    try:
        committed_sf = json.load(open(detail_path)).get("sf")
    except (OSError, ValueError):
        pass
    if payload.get("sf") != 0.1 and committed_sf == 0.1:
        detail_path = os.path.join(here, "BENCH_DETAIL_dev.json")
        print(
            f"# dev-sf run (sf={payload.get('sf')}): full payload -> "
            "BENCH_DETAIL_dev.json (committed sf0.1 sidecar preserved)",
            file=sys.stderr,
        )
    # Preserve side-channel blocks other tools merged into the sidecar
    # (scripts/ab_bench.py writes interleaved A/B results as ab_vs_*) —
    # a bench rewrite must not erase that evidence.
    try:
        prior_detail = json.load(open(detail_path))
        for k, v in prior_detail.items():
            if (
                k.startswith(("ab_vs_", "evidence_"))
                and k not in payload
            ):
                payload[k] = v
    except (OSError, ValueError):
        pass
    with open(detail_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps(_compact_line(payload), separators=(",", ":")))
    spark.stop()
    if (
        not gate.get("ok", True)
        or not ing_gate.get("ok", True)
        or not (ing10_gate or {}).get("ok", True)
        or not rec_gate.get("ok", True)
        or not routed_gate.get("ok", True)
        or not routed_hard_gate.get("ok", True)
    ):
        sys.exit(3)  # gate breach (offenders on stderr)


def _compact_line(payload: dict, budget: int = 1900) -> dict:
    timings = payload["queries"]
    out = {
        "metric": payload["metric"],
        "value": round(payload["value"], 1),
        "unit": "sec",
        "queries": {},
        "n_queries": len(timings),
        "sf": payload["sf"],
        "ingest_rows_per_sec": payload["ingest"]["rows_per_sec"],
        "detail": "BENCH_DETAIL.json",
    }
    if "scaling" in payload:
        ratios = [
            v["ratio"]
            for v in payload["scaling"]["keys"].values()
            if v.get("ratio")
        ]
        # r14 (VERDICT r13 item 8): max_ratio is dominated by the
        # DECLARED superlinear fixture-truth twins (kept deliberately
        # as the quadratic controls next to their banded/fixed-k
        # production siblings — SURVEY §2.16). Emit that set, plus the
        # worst ratio among the production (linear-contract) keys, so
        # the one-line number stays interpretable without the round
        # doc. Additions only — max_ratio keeps its old meaning.
        linear = [
            v["ratio"]
            for k, v in payload["scaling"]["keys"].items()
            if v.get("ratio") and k not in DECLARED_SUPERLINEAR
        ]
        out["scaling"] = {
            "factor": payload["scaling"]["factor"],
            "n_keys": len(ratios),
            "max_ratio": max(ratios) if ratios else None,
            "max_ratio_linear_contract": max(linear) if linear else None,
            "declared_superlinear": sorted(
                k
                for k in payload["scaling"]["keys"]
                if k in DECLARED_SUPERLINEAR
            ),
        }
        rec = payload["scaling"].get("recall_10x")
        if rec and "error" not in rec:
            out["scaling"]["recall_10x"] = rec
        rec10c = payload["scaling"].get("recall_clustered_10x")
        if rec10c and "error" not in rec10c:
            out["scaling"]["recall_clustered_10x"] = rec10c
        rec10h = payload["scaling"].get("recall_clustered_hard_10x")
        if rec10h and "error" not in rec10h:
            out["scaling"]["recall_clustered_hard_10x"] = rec10h
    if not payload.get("regression_gate", {}).get("ok", True):
        out["regression_gate"] = "FAILED"
    if not payload.get("ingest_gate", {}).get("ok", True):
        out["ingest_gate"] = "FAILED"
    if not payload.get("ingest_gate_10x", {}).get("ok", True):
        out["ingest_gate_10x"] = "FAILED"
    if not payload.get("recall_gate", {}).get("ok", True):
        out["recall_gate"] = "FAILED"
    if not payload.get("recall_gate_routed", {}).get("ok", True):
        out["recall_gate_routed"] = "FAILED"
    if not payload.get("recall_gate_routed_hard", {}).get("ok", True):
        out["recall_gate_routed_hard"] = "FAILED"
    if "common_with_prev" in payload:
        out["common_with_prev"] = payload["common_with_prev"]
    for threshold in (0.5, 1.0, 2.0, 5.0, 1e9):
        slow = {k: round(v, 1) for k, v in timings.items() if v >= threshold}
        fast = sum(v for v in timings.values() if v < threshold)
        out["queries"] = dict(
            sorted(slow.items()), _rest_total=round(fast, 1)
        )
        if len(json.dumps(out, separators=(",", ":"))) <= budget:
            break
    return out


if __name__ == "__main__":
    main()
