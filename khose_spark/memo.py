"""Deterministic lifecycle for session-memoized checkpoint relations
(VERDICT r13 items 1-2, guide §5).

The r13 memo discipline (doc_shingles, MinHash signatures, the graph
backbone family) eagerly ``localCheckpoint``s a shared relation once
per (applicationId, sf_dir) so identical subplans stop being recomputed
across registered keys. What it lacked was a RELEASE path: the
checkpoint blocks were pinned for the whole session with no eviction,
which at 100 TB is a memory/disk-spill hazard (the shingle relation is
larger than the corpus) and, on a second sf_dir in the same session,
doubled the pinned footprint.

This module gives every memo cache the same two lifecycle rules:

- **LRU-of-one sf_dir**: inserting a new key evicts-and-unpersists any
  other key in the same cache (a bench's 10x scaling block, or a test
  session sweeping fixtures, never pins two corpora at once).
- **Deterministic release**: ``release(cache, key)`` / ``release_all()``
  unpersist the checkpoint's storage blocks NOW, not when the JVM's
  ContextCleaner happens to collect the RDD. bench.py calls
  ``release_all`` after the timed loop + regression gate; plancheck's
  ``reset_plan_state`` routes through it as well.

Mechanics: ``DataFrame.localCheckpoint`` persists an *internal* RDD
that the returned DataFrame does not expose, so ``put`` snapshots
``sc.getPersistentRDDs()`` around the build and records the RDD handles
that appeared — those are exactly the blocks the checkpoint pinned
(memo builds are driver-sequential here, like every query path). On a
real cluster the same relations would be reliable checkpoints (HDFS) or
written tables — ``localCheckpoint`` is lost with an executor, which is
acceptable for a single-node bench but a recompute-impossible job
failure at scale; see OPTIMIZATION_r14.md for the production posture.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

# (id(cache), key) -> list of JavaRDD handles persisted by that entry.
_RDD_HANDLES: dict[tuple[int, object], list] = {}

# Every cache dict that ever went through put(), so release_all() and
# plancheck.reset_plan_state can sweep without each module registering
# itself by hand.
_KNOWN_CACHES: list[dict] = []


def _persistent_rdds(spark):
    """The JVM's id -> JavaRDD map of currently persisted RDDs."""
    return spark.sparkContext._jsc.getPersistentRDDs()


def put(
    spark,
    cache: dict,
    key: object,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Build + insert a memoized relation with lifecycle tracking.

    Evicts (and unpersists) every OTHER key in ``cache`` first — the
    LRU-of-one rule — then runs ``build()`` (which is expected to end
    in an eager ``localCheckpoint``) and records the persisted-RDD
    handles that appeared during the build so ``release`` can free
    them deterministically."""
    for old in [k for k in list(cache) if k != key]:
        release(cache, old)
    if not any(c is cache for c in _KNOWN_CACHES):
        _KNOWN_CACHES.append(cache)
    jmap = _persistent_rdds(spark)
    before = {int(i) for i in jmap.keySet().toArray()}
    df = build()
    jmap = _persistent_rdds(spark)
    handles = [
        jmap.get(i)
        for i in jmap.keySet().toArray()
        if int(i) not in before
    ]
    _RDD_HANDLES[(id(cache), key)] = [h for h in handles if h is not None]
    cache[key] = df
    return df


def release(cache: dict, key: object) -> None:
    """Drop one memo entry and unpersist its storage blocks now.

    Covers both memo styles: ``localCheckpoint`` entries free their
    tracked internal-RDD handles; ``persist()`` entries (whose cache
    lives in the CacheManager, invisible to the RDD snapshot) free via
    ``DataFrame.unpersist`` — a no-op on the other style, so both are
    always attempted."""
    df = cache.get(key)
    if isinstance(df, DataFrame):
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — ctx gone / already cleaned
            pass
    for h in _RDD_HANDLES.pop((id(cache), key), []):
        try:
            h.unpersist(False)
        except Exception:  # noqa: BLE001 — already cleaned / ctx gone
            pass
    cache.pop(key, None)


def release_all() -> None:
    """Release every tracked memo entry in every known cache."""
    for cache in _KNOWN_CACHES:
        for key in list(cache):
            release(cache, key)
