"""Full-board oracle sweep — the same-day correctness signal VERDICT r05
asked for (next-round item #7).

The grading driver samples ~50 keys/round (oldest-first), so a key added
in round N may not be driver-checked until round N+2. This script closes
that gap: it drives the REAL product surface (`__spark_entry__.py`, not
the pytest fixtures) from a hostile non-UTC session exactly the way the
driver does, runs EVERY oracled key against DuckDB at sf0.01 (the graded
scale), optionally repeats the sweep at sf0.1 (the defensive scale where
rounding/overflow traps fire — SURVEY.md §5.2), runs every rows-only key,
and writes one `LOCAL_CORRECTNESS.json` artifact at the repo root.

Usage:
    python scripts/verify_sweep.py              # sf0.01 sweep (graded scale)
    python scripts/verify_sweep.py --defensive  # + sf0.1 sweep of all keys
    python scripts/verify_sweep.py q_agg_gini …  # subset of keys

Exit 0 iff every checked key is green.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def oracle_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for tname in TABLES:
        con.sql(
            f"CREATE VIEW {tname} AS SELECT * FROM '{sf_dir}/{tname}.parquet'"
        )
    return con


def sweep(spark, sf_dir: str, keys: list[str]) -> dict[str, dict]:
    """Run every key in ``keys`` Spark-vs-DuckDB at ``sf_dir``; rows-only
    keys (no oracle) get the driver's weaker runs+rows check."""
    import __spark_entry__ as E

    from tests._parity import compare, run_query_cache_checked

    qs = E.queries()
    oracles = E.oracle_sql()
    con = oracle_connection(sf_dir)
    results: dict[str, dict] = {}
    for k in keys:
        t0 = time.perf_counter()
        try:
            # The cache-lifecycle gate rides along: a key that leaks a
            # persisted relation fails its sweep entry, same as parity.
            df = run_query_cache_checked(k, qs[k], spark, sf_dir)
            if k in oracles:
                spark_pdf = df.toPandas()
                oracle_pdf = con.sql(oracles[k]).df()
                problems = compare(spark_pdf, oracle_pdf)
                status = "pass" if not problems else "FAIL"
                detail = "; ".join(problems[:3])
                n = len(spark_pdf)
            else:
                n = df.count()
                ok = n >= 0 and len(df.schema.fields) > 0
                status = "rows-only" if ok else "FAIL"
                detail = ""
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            status, detail, n = "ERROR", f"{type(exc).__name__}: {exc}", -1
        dt = round(time.perf_counter() - t0, 3)
        results[k] = {"status": status, "rows": n, "sec": dt}
        if detail:
            results[k]["detail"] = detail
        tag = "ok  " if status in ("pass", "rows-only") else status
        print(f"{tag} {k} ({n} rows, {dt:.2f}s)", file=sys.stderr)
    con.close()
    return results


def main() -> int:
    defensive = "--defensive" in sys.argv
    wanted = [a for a in sys.argv[1:] if not a.startswith("--")]

    from pyspark.sql import SparkSession

    # Hostile session on purpose: non-UTC tz proves prep_session repairs
    # the driver's session rather than relying on a friendly default.
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.driver.memory", "8g")
        .appName("khose-verify-sweep")
        .getOrCreate()
    )

    import __spark_entry__ as E

    entry_rows = len(E.entry(spark).collect())
    assert entry_rows > 0, "entry() returned no rows"
    tz = spark.conf.get("spark.sql.session.timeZone")
    assert tz == "UTC", f"prep_session did not repair tz: {tz}"

    keys = wanted or sorted(E.queries())
    report: dict = {
        "entry_rows": entry_rows,
        "tz_repaired": tz,
        "n_keys": len(keys),
    }

    t0 = time.perf_counter()
    report["sf0.01"] = sweep(spark, "/root/testdata/sf0.01", keys)
    if defensive:
        report["sf0.1"] = sweep(spark, "/root/testdata/sf0.1", keys)
    report["total_sec"] = round(time.perf_counter() - t0, 1)

    def tally(res: dict[str, dict]) -> dict[str, int]:
        out: dict[str, int] = {}
        for v in res.values():
            out[v["status"]] = out.get(v["status"], 0) + 1
        return out

    report["summary"] = {
        sf: tally(report[sf]) for sf in ("sf0.01", "sf0.1") if sf in report
    }
    bad = sum(
        n
        for t in report["summary"].values()
        for s, n in t.items()
        if s not in ("pass", "rows-only")
    )
    report["green"] = bad == 0

    # Only the full-board sweep is the committed artifact; subset runs
    # are a dev loop and must not overwrite the round's record.
    if not wanted:
        path = os.path.join(REPO, "LOCAL_CORRECTNESS.json")
        with open(path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {path}", file=sys.stderr)

    print(json.dumps({"green": report["green"], **report["summary"]}))
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
