"""One timing pass over a named key list against an arbitrary repo tree.

Usage: python scripts/ab_pass.py <repo_root> <sf_dir> <keys_file>

Imports khose_spark FROM <repo_root> (so the same runner can time the
current tree and a checked-out prior round side-by-side), warms the JVM
and parquet footers exactly like bench.py, times each key to count()
materialization, and prints ONE JSON line {key: sec} on stdout.

This is the measurement half of the interleaved A/B methodology
BASELINE.md prescribes for host noise (VERDICT r11 item 1): the
orchestrator (scripts/ab_bench.py) alternates passes A,B,A,B so slow
host epochs hit both trees equally.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    repo, sf_dir, keys_file = sys.argv[1], sys.argv[2], sys.argv[3]
    sys.path.insert(0, repo)
    os.chdir(repo)
    keys = [
        line.strip()
        for line in open(keys_file)
        if line.strip() and not line.startswith("#")
    ]
    from khose_spark import registry
    from khose_spark.session import get_spark

    registry.load_all()
    spark = get_spark("khose-ab-pass")
    # Warm JVM + parquet footers once (mirrors bench.py main()).
    registry.QUERIES[keys[0]](spark, sf_dir).count()
    timings: dict[str, float] = {}
    for name in keys:
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        print(f"# {name}: {dt:.3f}s rows={n}", file=sys.stderr)
    spark.stop()
    print(json.dumps(timings))
    return 0


if __name__ == "__main__":
    sys.exit(main())
