"""Full-board oracle sweep — the same-day correctness signal VERDICT r05
asked for (next-round item #7), extended per VERDICT r06 with the two
missing evidence modes:

- ``--scale10``: run the DuckDB oracle sweep against the deterministic
  10× materialization of sf0.1 (khose_spark/scaling.py — the dir bench
  already times) and write ``LOCAL_CORRECTNESS_10x.json``. Every prior
  decade jump (sf0.01→sf0.1) caught real int64-overflow/rounding bugs;
  this is the first CORRECTNESS (not just timing) evidence at the next
  decade.
- ``--changed``: incremental per-commit mode. Each full sweep records a
  per-key fingerprint (defining-module source hash + oracle-SQL hash)
  in the artifact; ``--changed`` re-runs only keys whose fingerprint
  drifted since the committed ``LOCAL_CORRECTNESS.json`` and merges the
  refreshed rows back in — same-day signal at ~seconds-per-changed-key
  instead of the ~11-minute full board.

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
    python scripts/verify_sweep.py --changed    # only fingerprint-drifted keys
    python scripts/verify_sweep.py --scale10 [keys …]  # 10× sf0.1 oracle sweep
    python scripts/verify_sweep.py q_agg_gini …  # subset of keys

Exit 0 iff every checked key is green.
"""

from __future__ import annotations

import hashlib
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

SCALE_BASE = "/root/testdata/sf0.1"
SCALE_FACTOR = 10

# Keys whose REGISTERED form is documented as fixture-scale ground truth
# with quadratic cost by design (their scale path is the banded/blocked
# twin, which IS swept): running them on the 10× dir would be an
# intentional O(n²) blow-up, not evidence. Recorded in the artifact as
# "skipped" with the reason, so the gap is visible, not silent.
# Empty since round 8: q_llm_lsh_threshold_sweep — the last quadratic
# registration — now ships the lossless 16×1 slot-band form in both
# engines (tests/test_threshold_sweep.py holds the all-pairs twin).
SCALE10_SKIP: dict[str, str] = {}

# Keys that stay at the 10× board when factor >= 100 (ALL are green
# there — LOCAL_CORRECTNESS_10x.json): their ORACLE or their exact
# ground-truth verifier tier is pairwise/collision-quadratic BY
# CONTRACT (the fixture-scale truth twin of a banded production tier),
# so a 100× run would execute O(n²)-by-design SQL — cost, not
# evidence. The production tiers these certify (banded minhash/simhash
# joins, LSH buckets, cluster-prune) are all collision-bounded and ARE
# in the 100× board via their registered keys where linear.
_Q = "quadratic-by-contract at 100x: "
SCALE100_SKIP = {
    "q_llm_neardup_jaccard": _Q + "exact shingle-intersection verifier"
    " (collision mass ~ sum |shingle group|^2) — the ALL-PAIRS truth"
    " twin; the registered 100x-runnable sibling is"
    " q_llm_neardup_jaccard_banded (band candidates + exact verify)",
    "q_llm_containment": _Q + "sub-document containment, same shingle-"
    "collision shape — truth twin of q_llm_containment_banded, which"
    " runs at 100x",
    "q_llm_minhash_det": _Q + "oracle is the declared ALL-PAIRS truth"
    " twin of the banded Spark plan",
    "q_llm_simhash": _Q + "oracle is the all-pairs hamming truth twin"
    " of the banded Spark plan",
    "q_llm_minhash_estimator_audit": _Q + "exact-Jaccard ground-truth"
    " tier (shingle self-join) in both engines",
    "q_llm_lsh_recall_audit": _Q + "recall denominator IS the exact"
    " all-candidate tier",
    "q_llm_containment_recall_audit": _Q + "containment truth tier is"
    " the same all-pairs shingle equi-join; the production tier it"
    " certifies — linear sibling: q_llm_containment_banded — runs at"
    " 100x",
    "q_llm_lsh_threshold_sweep": _Q + "single-slot band collisions ~"
    " sum |(slot,val) group|^2 — 16x cheaper than all-pairs but still"
    " quadratic mass; 10x-proven (29 s);"
    " linear sibling: q_llm_neardup_jaccard_banded (8x2 banding keeps"
    " collision mass candidate-bounded)",
    "q_llm_lsh_srp": _Q + "4-bit band CONTRACT gives ~n^2/16"
    " candidates (docstring scale law; production widens b);"
    " linear sibling: q_llm_semdedup_fixedk (8-bit SRP bands +"
    " fixed 64-cell routing, collision-bounded)",
    "q_llm_neardup_cosine": _Q + "pairwise-cosine verifier tier;"
    " linear sibling: q_llm_semdedup_fixedk (exact-cosine verify on"
    " banded candidates only)",
    "q_llm_neardup_two_tier": _Q + "exact tier runs over SRP"
    " candidates (~n^2/16); rows-only key;"
    " linear sibling: q_llm_neardup_jaccard_banded (band candidates"
    " + exact verify)",
    "q_llm_semdedup": _Q + "within-cluster pairwise prune (~n^2/k for"
    " fixed fixture k) — truth twin of q_llm_semdedup_fixedk (fixed"
    " 64-cell routing + in-cluster SRP band candidates), which runs"
    " at 100x",
    "q_llm_dedup_clusters": _Q + "edge generation is the shingle-"
    "collision pair tier; oracle is a recursive CTE over those pairs",
    "q_llm_dedup_apply": _Q + "same pair-generation chain as"
    " dedup_clusters",
    "q_llm_dedup_funnel": _Q + "funnel recomputes the exact-verify"
    " stage (all-pairs oracle stage)",
    "q_mm_phash_dedup": _Q + "oracle verifies banded pairs against"
    " pairwise hamming truth",
    "q_join_range_bucketed": _Q + "within-window event-pair mass grows"
    " x100 per decade (fixed month at 100x density): the IEJoin oracle"
    " measured ~160 s at 10x => ~4 h at 100x; the Spark side is the"
    " 1-row bucketed-join aggregate and stays cheap",
    "q_llm_negative_sampling": _Q + "fixture pool contract = n/10 of"
    " the corpus, so the query x pool ranking is n^2/10 md5 evals in"
    " BOTH engines — 10x-verified (6.3 s); at 100x the 2e9-pair mass"
    " heap-OOMs the local[32] executor (measured r08). The registered"
    " production shape is q_llm_negative_sampling_fixedpool (constant"
    " 1000-doc broadcast pool), which runs at 100x",
    "q_llm_incremental_dedup": _Q + "the exact-verify tier over the"
    " delta's shingle-collision candidates grows superlinearly on the"
    " decorrelated corpus (19.6 s at 10x, >17 min unfinished at 100x,"
    " measured r08) — the delta-vs-base JOIN shape itself is linear and"
    " 10x-verified; the oracle's verification mass is the bound",
    # The sampled-codebook family: the fixture contract derives the
    # centroid/code set from every 50th vector, so k grows WITH the
    # corpus and the assign stage is n*k = n^2/50 distance evals in
    # BOTH engines — superlinear by construction, not by plan defect
    # (the 10x board runs all six green, and the r08 OOM forensics
    # traced the 117 GB DuckDB blow-up to exactly this shape in
    # q_llm_kmeans' unrolled Lloyd chain). Since round 9 each member
    # has a REGISTERED constant-k production twin
    # (similarity_fixedk.py: the _fixedk keys, 64 md5-ranked seeds)
    # that runs on the 100x board — the sampled forms stay as the
    # fixture-scale truth twins.
    **{
        k: _Q + "sampled codebook k = n/50 makes assign cost n^2/50"
        " in both engines (fixture-scale truth-twin contract) —"
        f" 10x-verified; the linear registered sibling {k}_fixedk"
        " runs at 100x"
        for k in (
            "q_llm_ann_ivf",
            "q_llm_ann_pq",
            "q_llm_ann_pq_indexed",
            "q_llm_ann_pq_rerank",
            "q_llm_kmeans",
            "q_ml_silhouette",
        )
    },
}


def oracle_connection(sf_dir: str):
    """DuckDB connection with the fixture tables registered as views.
    Handles both layouts: the driver's single-file fixtures
    (``table.parquet`` is a file) and Spark-written datasets
    (``table.parquet`` is a directory of part files — the 10× dirs)."""
    import duckdb

    con = duckdb.connect()
    # Cap the in-process oracle engine: an unbounded DuckDB query at
    # 100x volume can balloon past system RAM and get the WHOLE sweep
    # OOM-killed (measured r08: 117 GB RSS, kernel kill, every
    # completed-but-unmerged key in the chunk lost). With a limit +
    # temp_directory DuckDB spills to disk or raises OutOfMemoryException
    # — either way the sweep records an ERROR row and keeps going.
    mem = os.environ.get("SPARK_GRAFT_ORACLE_MEM", "48GB")
    con.sql(f"SET memory_limit='{mem}'")
    con.sql("SET temp_directory='/tmp/khose_duckdb_spill'")
    # Row order never matters to the compare (both the pandas and the
    # digest harness canonicalize by sorting), so let DuckDB drop
    # insertion-order preservation: the 3000x linreg/shapley oracles'
    # 450M-group hash aggregates spill ~40% less without it (r12: both
    # keys ENOSPC'd the 80 GB disk with it on).
    con.sql("SET preserve_insertion_order=false")
    for tname in TABLES:
        path = f"{sf_dir}/{tname}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {tname} AS SELECT * FROM '{path}'")
    return con


def fingerprints(keys: list[str]) -> dict[str, dict[str, str]]:
    """Per-key change-detection fingerprint: sha256 of the defining
    module's source + sha256 of the oracle SQL text. A key re-runs under
    ``--changed`` iff either hash moved. Deliberately module-granular:
    an edit anywhere in operators/aggregates.py re-checks every
    aggregates key (cheap, safe); edits to shared helpers (tables.py,
    rank.py) are rarer and covered by the full per-round sweep."""
    import __spark_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    mod_hash: dict[str, str] = {}
    out: dict[str, dict[str, str]] = {}
    for k in keys:
        m = getattr(qs[k], "__module__", "?")
        if m not in mod_hash:
            f = getattr(sys.modules.get(m), "__file__", None)
            mod_hash[m] = (
                hashlib.sha256(open(f, "rb").read()).hexdigest()[:16]
                if f
                else "?"
            )
        osql = oracles.get(k, "")
        out[k] = {
            "module": mod_hash[m],
            "oracle": hashlib.sha256(osql.encode()).hexdigest()[:16],
        }
    return out


def sweep(
    spark,
    sf_dir: str,
    keys: list[str],
    rewrite_oracles: bool = False,
    digest_dir: str | None = None,
    crosscheck: bool = False,
) -> dict[str, dict]:
    """Run every key in ``keys`` Spark-vs-DuckDB at ``sf_dir``; rows-only
    keys (no oracle) get the driver's weaker runs+rows check.

    ``rewrite_oracles`` applies the semantics-neutral ``AS MATERIALIZED``
    hint to multiply-referenced fact-scale CTEs (khose_spark.oracle_opt)
    — required at 10× volume where DuckDB's CTE re-inlining turns the
    unrolled-iteration oracles exponential; the sf0.01/sf0.1 sweeps run
    the committed strings verbatim, exactly like the driver.

    ``digest_dir`` switches oracled keys to the aggregate-contract
    compare (khose_spark.digestcmp, round 8): Spark WRITES its result
    relation to ``digest_dir/<key>`` as parquet (no driver collect at
    any size) and DuckDB digests both relations with one shared
    canonicalization — this is what lets O(n)-row-returning keys run at
    100× where ``toPandas()`` was the harness bound. ``crosscheck``
    additionally runs the fixture-scale pandas compare on the same
    result and records any verdict disagreement — the self-check that
    certifies the digest harness against the proven one at sf0.01."""
    import __spark_entry__ as E

    from tests._parity import compare, run_query_cache_checked

    qs = E.queries()
    oracles = E.oracle_sql()
    if rewrite_oracles:
        from khose_spark.oracle_opt import materialize_multiref_ctes

        # The PQ oracles sit exactly on a round-4 boundary: materializing
        # their codebook CTE regroups DuckDB's float accumulation and
        # flips one distance from 1.3490 to 1.3489 (measured sf0.001,
        # r07). They run verbatim — their fact CTE is embeddings-sized,
        # so re-inlining is cheap at any fixture scale.
        skip = {
            "q_llm_ann_pq",
            "q_llm_ann_pq_indexed",
            "q_llm_ann_pq_rerank",  # shares the boundary-sensitive
                                    # ADC CTE prefix (r08)
        }
        oracles = {
            k: v if k in skip else materialize_multiref_ctes(v)
            for k, v in oracles.items()
        }
    con = oracle_connection(sf_dir)
    results: dict[str, dict] = {}
    for k in keys:
        # Announce BEFORE running (flushed through any pipe): when a key
        # hangs or the process is killed mid-key, the log names the
        # culprit instead of ending at the previous success (r08 OOM
        # forensics).
        print(f"run  {k}", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        try:
            # The cache-lifecycle gate rides along: a key that leaks a
            # persisted relation fails its sweep entry, same as parity.
            df = run_query_cache_checked(k, qs[k], spark, sf_dir)
            if k in oracles and digest_dir is not None:
                from khose_spark.digestcmp import digest_compare

                dest = os.path.join(digest_dir, k)
                df.write.mode("overwrite").parquet(dest)
                problems, n = digest_compare(con, oracles[k], dest)
                status = "pass" if not problems else "FAIL"
                detail = "; ".join(problems[:3])
                if crosscheck:
                    pd_problems = compare(df.toPandas(), con.sql(oracles[k]).df())
                    if bool(pd_problems) != bool(problems):
                        status = "FAIL"
                        detail = (
                            "digest/pandas verdict disagreement: "
                            f"digest={problems[:2]} pandas={pd_problems[:2]}"
                        )
            elif k in oracles:
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
        if digest_dir is not None and k in oracles:
            results[k]["mode"] = "digest+pandas" if crosscheck else "digest"
        if detail:
            results[k]["detail"] = detail
        tag = "ok  " if status in ("pass", "rows-only") else status
        print(f"{tag} {k} ({n} rows, {dt:.2f}s)", file=sys.stderr, flush=True)
    con.close()
    return results


def _tally(res: dict[str, dict]) -> dict[str, int]:
    out: dict[str, int] = {}
    for v in res.values():
        out[v["status"]] = out.get(v["status"], 0) + 1
    return out


def _bad_count(summary: dict) -> int:
    return sum(
        n
        for t in summary.values()
        for s, n in t.items()
        if s not in ("pass", "rows-only")
    )


def _session():
    from pyspark.sql import SparkSession

    # Hostile session on purpose: non-UTC tz proves prep_session repairs
    # the driver's session rather than relying on a friendly default.
    # Heap/partition overrides for the decade probes: 8g/32 is right
    # for the graded scales, but a 1.8B-row (3000×) digest run OOMs the
    # single local JVM — the 3000× retry runs with
    # SPARK_GRAFT_DRIVER_MEM=48g SPARK_GRAFT_SHUFFLE=128.
    return (
        SparkSession.builder.master("local[32]")
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
        )
        .config("spark.sql.session.timeZone", "America/New_York")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .appName("khose-verify-sweep")
        .getOrCreate()
    )


def run_scale10(
    wanted: list[str],
    factor: int = SCALE_FACTOR,
    digest: bool = False,
    dir_override: str | None = None,
) -> int:
    """Oracle sweep at ``factor``× sf0.1 → LOCAL_CORRECTNESS_{factor}x.json.

    Defaults to the FULL oracled board; pass keys for a subset (subset
    runs merge into an existing artifact, or create one marked
    ``partial``). At factor 10 the scaled dir is the exact
    materialization bench.py times (same path), so correctness evidence
    and timing evidence cover the same bytes. Factors beyond 10 exist
    to chase the int64-overflow family one more decade (every decade
    jump so far caught a real widening bug).

    ``dir_override`` points the sweep at a caller-provided
    materialization instead of building the full ``factor``× fixture —
    the 1000× lineitem/orders probe dir (scripts/margin_audit.py
    ``ensure_lineitem_scale`` + symlinks for the untouched tables) is
    the intended caller; ensure_scale_dir caps at 128× and a full
    1000× materialization would be ~100 GB for keys that read two
    tables."""
    spark = _session()
    import __spark_entry__ as E

    from khose_spark.scaling import ensure_scale_dir

    tag = os.path.basename(SCALE_BASE.rstrip("/"))
    dest = (
        os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/khose_scale")
        + f"_{tag}_x{factor}"
    )
    if dir_override:
        dest = dir_override.rstrip("/")
        big = dest
    else:
        big = ensure_scale_dir(spark, SCALE_BASE, dest, factor=factor)
    skip = dict(SCALE10_SKIP)
    if factor >= 100:
        skip.update(SCALE100_SKIP)
    # The declared skip set applies to EXPLICIT key lists too (r08: a
    # chunked runner fed the whole board through `wanted`, which
    # silently re-admitted the quadratic-by-contract oracles at 100x —
    # one IEJoin oracle then ate the chunk). Skipped wanted keys are
    # recorded with their reasons, same as full-board runs.
    if wanted:
        keys = [k for k in wanted if k not in skip]
        skipped_here = {k: skip[k] for k in wanted if k in skip}
    else:
        keys = [k for k in sorted(E.queries()) if k not in skip]
        skipped_here = skip
    report: dict = {
        "base": SCALE_BASE,
        "factor": factor,
        "dir": big,
        "n_keys": len(keys),
        "skipped": skipped_here,
    }
    report["oracle_rewrite"] = (
        "multi-referenced fact-scale CTEs executed AS MATERIALIZED "
        "(khose_spark.oracle_opt — evaluation hint, semantics-neutral)"
    )
    if digest:
        report["compare_mode"] = (
            "digest (khose_spark.digestcmp aggregate contract — "
            "Spark result written as parquet, both relations digested "
            "by DuckDB with one shared canonicalization)"
        )
    # Self-describing per-factor label (r09 verdict nit: the 100×
    # artifact carried a copy-pasted "scale10" section name). Factor 10
    # keeps the historical "scale10" name; other factors get their own.
    label = f"scale{factor}"
    t0 = time.perf_counter()
    report[label] = sweep(
        spark,
        big,
        keys,
        rewrite_oracles=True,
        digest_dir=(dest + "_digest") if digest else None,
    )
    report["total_sec"] = round(time.perf_counter() - t0, 1)
    report["summary"] = {label: _tally(report[label])}
    bad = _bad_count(report["summary"])
    report["green"] = bad == 0
    path = os.path.join(REPO, f"LOCAL_CORRECTNESS_{factor}x.json")
    if not wanted:
        with open(path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {path}", file=sys.stderr)
    elif os.path.exists(path):
        # Green subset runs (e.g. a just-added key) merge into the
        # round's artifact instead of leaving a coverage hole until the
        # next full board. Red rows merge too — the artifact records
        # reality either way. The printed/returned verdict is the
        # MERGED artifact's (ADVICE r07): a green subset must not mask
        # red keys still recorded from earlier runs.
        merged = json.load(open(path))
        # Migrate any pre-r10 artifact still carrying the copy-pasted
        # "scale10" section name at a non-10 factor.
        if label != "scale10" and "scale10" in merged:
            merged[label] = merged.pop("scale10")
        merged.setdefault(label, {}).update(report[label])
        # A key that now has a real row is no longer skipped (r08: the
        # de-quadratified threshold sweep retired its skip entry);
        # conversely the factor's declared skip set is recorded with
        # reasons even when chunked subset runs built the artifact.
        merged["skipped"] = {
            k: v
            for k, v in {**skip, **merged.get("skipped", {})}.items()
            if k not in merged[label]
        }
        merged["summary"] = {label: _tally(merged[label])}
        merged["n_keys"] = len(merged[label])
        merged["green"] = _bad_count(merged["summary"]) == 0
        with open(path, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
        print(f"merged {len(keys)} keys into {path}", file=sys.stderr)
        report = merged
        bad = _bad_count(merged["summary"])
    else:
        # First subset run at a new factor: record it, marked partial.
        report["partial"] = True
        with open(path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {path} (partial)", file=sys.stderr)
    # Ledger-completeness enforcement (VERDICT r12 what's-wrong #1): at
    # the full-board decades every registry key must appear EITHER in
    # the factor board OR in the reasoned skip ledger — 13 r11 keys sat
    # in neither for a whole round and nothing flagged it. The gap list
    # is recorded in the artifact (tests/test_survey_sync.py re-asserts
    # it from pytest) and fails the sweep. Higher factors (the 1000×+
    # dir_override probes) are intentionally partial and exempt.
    if factor in (10, 100):
        registry_keys = set(E.queries())
        unledgered = sorted(
            registry_keys
            - set(report.get(label, {}))
            - set(report.get("skipped", {}))
        )
        report["unledgered"] = unledgered
        report["partial"] = bool(unledgered)
        if unledgered:
            report["green"] = False
            bad += len(unledgered)
            print(
                f"LEDGER HOLE: {len(unledgered)} registry keys have "
                f"neither a {label} row nor a reasoned skip: "
                f"{unledgered[:8]}{'…' if len(unledgered) > 8 else ''}",
                file=sys.stderr,
            )
        with open(path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps({"green": report["green"], **report["summary"]}))
    spark.stop()
    return 1 if bad else 0


def run_digest_selfcheck(wanted: list[str]) -> int:
    """Certify the digest harness against the proven pandas compare:
    every oracled key runs BOTH compares at sf0.01 and any verdict
    disagreement is a failure. Writes LOCAL_DIGEST_SELFCHECK.json —
    the evidence that a 100× digest `pass` means what a fixture-scale
    hash `pass` means."""
    import shutil
    import tempfile

    spark = _session()
    import __spark_entry__ as E

    keys = wanted or sorted(E.oracle_sql())
    digest_dir = tempfile.mkdtemp(prefix="khose_digest_selfcheck_")
    t0 = time.perf_counter()
    results = sweep(
        spark,
        "/root/testdata/sf0.01",
        keys,
        digest_dir=digest_dir,
        crosscheck=True,
    )
    report = {
        "sf_dir": "/root/testdata/sf0.01",
        "n_keys": len(keys),
        "total_sec": round(time.perf_counter() - t0, 1),
        "selfcheck": results,
        "summary": {"selfcheck": _tally(results)},
    }
    bad = _bad_count(report["summary"])
    report["green"] = bad == 0
    path = os.path.join(REPO, "LOCAL_DIGEST_SELFCHECK.json")
    if not wanted:
        with open(path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {path}", file=sys.stderr)
    shutil.rmtree(digest_dir, ignore_errors=True)
    print(json.dumps({"green": report["green"], **report["summary"]}))
    spark.stop()
    return 1 if bad else 0


def main() -> int:
    defensive = "--defensive" in sys.argv
    factor = next(
        (
            int(a.split("=", 1)[1])
            for a in sys.argv[1:]
            if a.startswith("--factor=")
        ),
        SCALE_FACTOR,
    )
    if "--scale10" in sys.argv:
        dir_override = next(
            (
                a.split("=", 1)[1]
                for a in sys.argv[1:]
                if a.startswith("--dir=")
            ),
            None,
        )
        return run_scale10(
            [a for a in sys.argv[1:] if not a.startswith("--")],
            factor=factor,
            digest="--digest" in sys.argv,
            dir_override=dir_override,
        )
    if "--digest-selfcheck" in sys.argv:
        return run_digest_selfcheck(
            [a for a in sys.argv[1:] if not a.startswith("--")]
        )
    changed_only = "--changed" in sys.argv
    wanted = [a for a in sys.argv[1:] if not a.startswith("--")]

    spark = _session()

    import __spark_entry__ as E

    entry_rows = len(E.entry(spark).collect())
    assert entry_rows > 0, "entry() returned no rows"
    tz = spark.conf.get("spark.sql.session.timeZone")
    assert tz == "UTC", f"prep_session did not repair tz: {tz}"

    all_keys = sorted(E.queries())
    artifact = os.path.join(REPO, "LOCAL_CORRECTNESS.json")
    if changed_only:
        try:
            prev = json.load(open(artifact))
        except (OSError, ValueError):
            prev = {}
        prev_fp = prev.get("fingerprints", {})
        now_fp = fingerprints(all_keys)
        keys = [k for k in all_keys if prev_fp.get(k) != now_fp[k]]
        print(
            f"--changed: {len(keys)}/{len(all_keys)} keys drifted",
            file=sys.stderr,
        )
        if not keys:
            print(json.dumps({"green": True, "changed": 0}))
            spark.stop()
            return 0
    else:
        keys = wanted or all_keys

    report: dict = {
        "entry_rows": entry_rows,
        "tz_repaired": tz,
        "n_keys": len(keys),
    }

    t0 = time.perf_counter()
    report["sf0.01"] = sweep(spark, "/root/testdata/sf0.01", keys)
    if defensive or changed_only:
        # --changed always re-checks the defensive scale too: a changed
        # module is exactly where a new overflow/rounding trap would be.
        report["sf0.1"] = sweep(spark, "/root/testdata/sf0.1", keys)
    report["total_sec"] = round(time.perf_counter() - t0, 1)

    report["summary"] = {
        sf: _tally(report[sf]) for sf in ("sf0.01", "sf0.1") if sf in report
    }
    bad = _bad_count(report["summary"])
    report["green"] = bad == 0

    # Full-board sweeps rewrite the committed artifact; --changed merges
    # its refreshed rows into it; ad-hoc subset runs are a dev loop and
    # must not overwrite the round's record.
    if changed_only and not bad:
        merged = prev if prev else {"summary": {}}
        for sf in ("sf0.01", "sf0.1"):
            merged.setdefault(sf, {}).update(report.get(sf, {}))
            if sf in merged:
                merged["summary"][sf] = _tally(merged[sf])
        merged["fingerprints"] = now_fp
        merged["green"] = _bad_count(merged["summary"]) == 0
        # n_keys tracks the merged board, not the launch-time count
        # (the r08 stale-n_keys nit: a --changed merge that adds keys
        # must grow the flagship artifact's headline number too).
        merged["n_keys"] = max(
            len(merged.get(sf, {})) for sf in ("sf0.01", "sf0.1")
        )
        merged["last_changed_sweep"] = {
            "n_keys": len(keys),
            "total_sec": report["total_sec"],
        }
        with open(artifact, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
        print(f"merged {len(keys)} keys into {artifact}", file=sys.stderr)
    elif not wanted and not changed_only:
        report["fingerprints"] = fingerprints(all_keys)
        with open(artifact, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {artifact}", file=sys.stderr)

    print(json.dumps({"green": report["green"], **report["summary"]}))
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
