"""Versioned parquet tables: snapshot commits + time travel without a
lakehouse jar (no Delta/Iceberg in this environment — SURVEY.md §8).

Layout (manifest-over-parquet, the same commit discipline the ingest
sink uses for exactly-once):

    table_root/
      data/v=000001/part-*.parquet     <- immutable snapshot data
      data/v=000002/part-*.parquet
      _manifests/000001.json           <- commit record (atomic rename)
      _manifests/000002.json

A snapshot is visible IFF its manifest exists: writers stage data first
and publish the manifest last (os.replace — atomic on POSIX), so a
crashed write leaves an orphan data dir that readers never see —
exactly the invariant tests/test_streaming.py proves for the ingest
sink. Readers resolve "latest" or any historical version from the
manifest listing alone (one small-dir listing, no data I/O), then read
ONLY that version's files — time travel is partition-path selection,
not data filtering, so it prunes perfectly at any scale.

MERGE/upsert semantics on top of snapshots are already covered as
operators (q_cdc_merge_upsert, q_scd2_history): merge = read latest +
apply CDC batch + commit as the next version.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession


def _manifest_dir(root: str) -> str:
    return os.path.join(root, "_manifests")


def _data_dir(root: str, version: int) -> str:
    return os.path.join(root, "data", f"v={version:06d}")


def list_versions(root: str) -> list[int]:
    """Committed versions, ascending. Only manifests count — staged or
    orphaned data dirs are invisible."""
    mdir = _manifest_dir(root)
    if not os.path.isdir(mdir):
        return []
    return sorted(
        int(f[:-5])
        for f in os.listdir(mdir)
        if f.endswith(".json") and f[:-5].isdigit()
    )


def commit_snapshot(
    df: DataFrame,
    root: str,
    note: str = "",
    partition_by: list[str] | None = None,
) -> int:
    """Write ``df`` as the next snapshot version and publish it
    atomically. Returns the committed version number.

    Stage-then-publish: data lands under its final ``data/v=N`` path
    first (parquet write), the manifest is written to a temp file and
    os.replace()d into place last. A crash before the replace leaves no
    visible snapshot.

    ``partition_by`` (round 11, the compaction-apply writer): lay the
    snapshot out hive-partitioned on the given columns — the rewrite
    job's bin layout — with the same atomic-manifest visibility rule."""
    versions = list_versions(root)
    version = (versions[-1] + 1) if versions else 1
    data_path = _data_dir(root, version)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(data_path)
    n_files = sum(
        1
        for _, _, fs in os.walk(data_path)
        for f in fs
        if f.endswith(".parquet")
    )
    manifest = {
        "version": version,
        "data_path": data_path,
        "n_files": n_files,
        "note": note,
        "committed_at": time.time(),
    }
    mdir = _manifest_dir(root)
    os.makedirs(mdir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=mdir, suffix=".staging")
    with os.fdopen(fd, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(mdir, f"{version:06d}.json"))
    return version


def read_snapshot(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read a committed snapshot — latest by default, or any historical
    version (time travel). Raises if the version was never committed."""
    versions = list_versions(root)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots under {root}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise FileNotFoundError(
            f"version {version} not committed (have {versions})"
        )
    return spark.read.parquet(_data_dir(root, version))


def snapshot_history(root: str) -> list[dict]:
    """The manifest records, ascending by version (the DESCRIBE HISTORY
    equivalent)."""
    out = []
    for v in list_versions(root):
        with open(
            os.path.join(_manifest_dir(root), f"{v:06d}.json"),
            encoding="utf-8",
        ) as fh:
            out.append(json.load(fh))
    return out


def vacuum(root: str, retain_last: int = 1) -> dict:
    """Garbage-collect the table: delete ORPHAN data dirs (staged by a
    crashed writer — present under data/ but never published in
    _manifests, so readers never saw them) and EXPIRE every committed
    snapshot except the newest ``retain_last`` (data dir AND manifest —
    time travel to an expired version fails afterwards, the Iceberg
    ``expire_snapshots`` + ``remove_orphan_files`` contract in one
    pass). Returns exact counts so callers can audit the deletion.

    Safety order: orphans and expired versions are identified against
    the manifest listing FIRST, then deleted; the retained snapshots'
    files are never touched, so a reader holding the latest version is
    unaffected (readers resolve paths from manifests alone)."""
    import shutil

    versions = list_versions(root)
    keep = set(versions[-retain_last:]) if retain_last > 0 else set()
    committed = set(versions)
    ddir = os.path.join(root, "data")
    stats = {
        "versions_before": len(versions),
        "orphan_dirs_removed": 0,
        "orphan_files_removed": 0,
        "expired_versions": 0,
        "expired_files_removed": 0,
        "kept_versions": sorted(keep),
        "kept_files": 0,
    }
    if not os.path.isdir(ddir):
        return stats
    for d in sorted(os.listdir(ddir)):
        if not d.startswith("v="):
            continue
        path = os.path.join(ddir, d)
        try:
            v = int(d[2:])
        except ValueError:
            v = None
        n_parquet = sum(
            1
            for _, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )
        if v is None or v not in committed:
            stats["orphan_dirs_removed"] += 1
            stats["orphan_files_removed"] += n_parquet
            shutil.rmtree(path)
        elif v not in keep:
            stats["expired_versions"] += 1
            stats["expired_files_removed"] += n_parquet
            shutil.rmtree(path)
            os.remove(os.path.join(_manifest_dir(root), f"{v:06d}.json"))
        else:
            stats["kept_files"] += n_parquet
    return stats
