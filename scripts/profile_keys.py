"""Per-key optimization profiler (round 13 — the optimization round).

For each named key (default: every headline key), from one warmed
session:
- capture ``explain("formatted")`` to plans/r13/<key>_<tag>.txt
- time the query to full materialization twice with the NOOP sink
  (guide §1.4 — computes every column, no sink cost) and once with the
  bench's count() action, reporting all three so plan-pruning effects
  under count() are visible.

Usage:
    python scripts/profile_keys.py [--tag before|after] [--no-plans] [key ...]

Writes one JSON line per key to stdout and the plan files under
plans/r13/. Measurement-only tooling: never imported by the engine.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from khose_spark import registry  # noqa: E402
from khose_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    tag = "before"
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]
    write_plans = "--no-plans" not in args
    if "--no-plans" in args:
        args.remove("--no-plans")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    if args:
        names = args
    else:
        import bench

        names = [n for n in bench.HEADLINE if n in registry.QUERIES]
    spark = get_spark("khose-profile")
    plans_dir = os.path.join(REPO, "plans", "r13")
    os.makedirs(plans_dir, exist_ok=True)

    # Session warmup (the bench does the same before timing).
    registry.QUERIES["q_agg_flagship_pricing"](spark, sf_dir).count()

    for name in names:
        fn = registry.QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        rec: dict = {"key": name}
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        rec["build_sec"] = round(time.perf_counter() - t0, 3)
        if write_plans:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(plans_dir, f"{name}_{tag}.txt"), "w"
            ) as f:
                f.write(plan)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        rec["noop1_sec"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        rec["noop2_sec"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        rec["count_sec"] = round(time.perf_counter() - t0, 3)
        rec["rows"] = n
        print(json.dumps(rec), flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
