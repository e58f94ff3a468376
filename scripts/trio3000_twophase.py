"""Two-phase 3000x digest certification for the spill-heaviest keys.

The single-process sweep runs the DuckDB oracle while the Spark session
is still alive — at the 3000x linreg/shapley volume that means the
oracle's ~45 GB hash-aggregate spill shares the disk with Spark's
~20 GB shuffle blockmgr, and the 80 GB disk ENOSPCs (measured twice,
r12). This runner splits the phases into separate PROCESSES:

  phase A: Spark only — run the registered key over the pruned-width
           3000x fixture, write the result relation as the digest
           parquet, exit (shuffle dirs freed with the process).
  phase B: DuckDB only — full machine for the oracle (96 GB memory
           limit, no co-resident JVM), digest_compare against phase
           A's parquet.

The merged row lands in LOCAL_CORRECTNESS_3000x.json in the sweep's
exact row format, so the artifact stays one record.

Usage: python scripts/trio3000_twophase.py q_ml_linreg_2f [...]
       python scripts/trio3000_twophase.py --phase-a <key> <dir> <dest>
       python scripts/trio3000_twophase.py --phase-b <key> <dir> <dest>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TRIO_DIR = "/tmp/khose_trio3000_dir"
DIGEST_DIR = "/tmp/khose_trio3000_digest"
ARTIFACT = os.path.join(REPO, "LOCAL_CORRECTNESS_3000x.json")


def phase_a(key: str, sf_dir: str, dest: str) -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE", "128"),
        )
        .config("spark.sql.session.timeZone", "America/New_York")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
        )
        .appName("khose-trio3000-phase-a")
        .getOrCreate()
    )
    import __spark_entry__ as E

    t0 = time.perf_counter()
    df = E.queries()[key](spark, sf_dir)
    df.write.mode("overwrite").parquet(dest)
    sec = round(time.perf_counter() - t0, 3)
    print(json.dumps({"phase": "a", "key": key, "spark_sec": sec}))
    spark.stop()
    return 0


def phase_b(key: str, sf_dir: str, dest: str) -> int:
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from verify_sweep import oracle_connection

    from khose_spark.digestcmp import digest_compare
    from khose_spark.oracle_opt import materialize_multiref_ctes

    import __spark_entry__ as E

    os.environ.setdefault("SPARK_GRAFT_ORACLE_MEM", "96GB")
    con = oracle_connection(sf_dir)
    sql = materialize_multiref_ctes(E.oracle_sql()[key])
    t0 = time.perf_counter()
    problems, n = digest_compare(con, sql, dest)
    sec = round(time.perf_counter() - t0, 3)
    print(
        json.dumps(
            {
                "phase": "b",
                "key": key,
                "oracle_sec": sec,
                "rows": n,
                "problems": problems[:3],
            }
        )
    )
    return 1 if problems else 0


def run_key(key: str) -> dict:
    dest = os.path.join(DIGEST_DIR, key)
    row: dict = {"mode": "digest", "harness": "two-phase (split "
                 "Spark/oracle processes — disk headroom)"}
    t0 = time.perf_counter()
    a = subprocess.run(
        [sys.executable, __file__, "--phase-a", key, TRIO_DIR, dest],
        capture_output=True,
        text=True,
        timeout=7200,
    )
    if a.returncode != 0:
        sys.stderr.write(a.stderr[-3000:])
        row.update(
            status="ERROR",
            rows=-1,
            detail="phase A (Spark) failed: " + a.stderr[-300:],
            sec=round(time.perf_counter() - t0, 3),
        )
        return row
    b = subprocess.run(
        [sys.executable, __file__, "--phase-b", key, TRIO_DIR, dest],
        capture_output=True,
        text=True,
        timeout=7200,
    )
    sec = round(time.perf_counter() - t0, 3)
    if b.returncode != 0 and not b.stdout.strip():
        sys.stderr.write(b.stderr[-3000:])
        row.update(
            status="ERROR",
            rows=-1,
            detail="phase B (oracle) failed: " + b.stderr[-300:],
            sec=sec,
        )
        return row
    out = json.loads(b.stdout.strip().splitlines()[-1])
    row.update(
        status="pass" if not out["problems"] else "FAIL",
        rows=out["rows"],
        sec=sec,
    )
    if out["problems"]:
        row["detail"] = "; ".join(out["problems"])
    return row


def main() -> int:
    if sys.argv[1:2] == ["--phase-a"]:
        return phase_a(sys.argv[2], sys.argv[3], sys.argv[4])
    if sys.argv[1:2] == ["--phase-b"]:
        return phase_b(sys.argv[2], sys.argv[3], sys.argv[4])
    keys = sys.argv[1:]
    if not keys:
        print("usage: trio3000_twophase.py <key> [...]", file=sys.stderr)
        return 2
    os.makedirs(DIGEST_DIR, exist_ok=True)
    merged = json.load(open(ARTIFACT))
    bad = 0
    for key in keys:
        print(f"run  {key}", file=sys.stderr, flush=True)
        row = run_key(key)
        tag = "ok  " if row["status"] == "pass" else row["status"]
        print(
            f"{tag} {key} ({row['rows']} rows, {row['sec']}s)",
            file=sys.stderr,
            flush=True,
        )
        bad += row["status"] != "pass"
        merged["scale3000"][key] = row
        merged["skipped"] = {
            k: v
            for k, v in merged.get("skipped", {}).items()
            if k not in merged["scale3000"]
        }
        tally: dict = {}
        for v in merged["scale3000"].values():
            tally[v["status"]] = tally.get(v["status"], 0) + 1
        merged["summary"] = {"scale3000": tally}
        merged["n_keys"] = len(merged["scale3000"])
        merged["green"] = not any(
            v["status"] not in ("pass", "rows-only")
            for v in merged["scale3000"].values()
        )
        with open(ARTIFACT, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
    print(json.dumps({"green": merged["green"], **merged["summary"]}))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
