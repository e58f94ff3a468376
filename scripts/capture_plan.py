"""Capture explain('formatted') for one or more registered keys at sf0.1.

Run: python scripts/capture_plan.py <suffix> <key> [<key> ...]
Writes plans/$KHOSE_PLANS_ROUND/<key>_<suffix>.txt for each key
(KHOSE_PLANS_ROUND defaults to r14; round 13's files stay under r13).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from khose_spark import registry  # noqa: E402
from khose_spark.plancheck import (  # noqa: E402
    INTERIOR_MARK,
    record_checkpoints,
    reset_plan_state,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    suffix = sys.argv[1]
    keys = sys.argv[2:]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName(f"capture_plan_{suffix}")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(
        here, "plans", os.environ.get("KHOSE_PLANS_ROUND", "r14")
    )
    os.makedirs(outdir, exist_ok=True)
    registry.load_all()
    for k in keys:
        # r14 (VERDICT r13 item 6): reset the memo caches per key, so a
        # key that runs after a sibling already built a shared memo is
        # still captured with its FRESH-build plan and checkpoint
        # interior, never as a bare warm-memo stub.
        reset_plan_state(spark)
        with record_checkpoints() as rec:
            df = registry.QUERIES[k](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        if rec.last is not None:
            # Checkpoint-final queries return a bare ExistingRDD stub;
            # append the final checkpoint's executed interior so the
            # file shows the plan that actually did the work (same
            # discipline as plans.lock.json's @checkpoint-interior).
            txt = f"{txt}\n\n{INTERIOR_MARK}\n\n{rec.last}"
        path = os.path.join(outdir, f"{k}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
