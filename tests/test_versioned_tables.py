"""Versioned-table (time-travel-lite) engine tests: snapshot commits,
historical reads, crash-invisibility of unpublished data, and the
merge-as-next-version pattern (khose_spark/tables_versioned.py)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from khose_spark.tables import t
from khose_spark.tables_versioned import (
    commit_snapshot,
    list_versions,
    read_snapshot,
    snapshot_history,
    vacuum,
)


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="khose_versioned_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_commit_and_time_travel(spark, sf_dir, root):
    nation = t(spark, sf_dir, "nation")
    v1 = commit_snapshot(nation.filter(F.col("n_regionkey") == 0), root, "r0")
    v2 = commit_snapshot(nation, root, "full")
    assert (v1, v2) == (1, 2)
    assert list_versions(root) == [1, 2]
    # latest = v2 (full table); as-of v1 = the filtered snapshot
    assert read_snapshot(spark, root).count() == nation.count()
    assert (
        read_snapshot(spark, root, 1).count()
        == nation.filter(F.col("n_regionkey") == 0).count()
    )
    hist = snapshot_history(root)
    assert [h["version"] for h in hist] == [1, 2]
    assert hist[0]["note"] == "r0"
    assert all(h["n_files"] >= 1 for h in hist)


def test_uncommitted_data_is_invisible(spark, sf_dir, root):
    """Crash between data write and manifest publish: the orphan data
    dir must not surface through any reader path — the same invariant
    the exactly-once ingest sink proves under failure injection."""
    nation = t(spark, sf_dir, "nation")
    commit_snapshot(nation, root, "v1")
    # simulate a crashed writer: stage v2 data, never publish a manifest
    staged = os.path.join(root, "data", "v=000002")
    nation.limit(3).write.mode("overwrite").parquet(staged)
    assert list_versions(root) == [1]
    assert read_snapshot(spark, root).count() == nation.count()
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root, 2)
    # the next committed version REUSES the orphan's slot cleanly
    # (overwrite mode replaces the staged files)
    v = commit_snapshot(nation.limit(5), root, "recovered")
    assert v == 2
    assert read_snapshot(spark, root, 2).count() == 5


def test_merge_is_next_version(spark, sf_dir, root):
    """CDC merge on snapshots: read latest + apply batch + commit next —
    the q_cdc_merge_upsert semantics composed with the snapshot log."""
    base = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    commit_snapshot(base, root, "base")
    updates = spark.createDataFrame(
        [(0, "RENAMED"), (999, "BRAND-NEW")], "n_nationkey int, n_name string"
    )
    cur = read_snapshot(spark, root)
    merged = (
        cur.join(updates, "n_nationkey", "left_anti")
        .unionByName(updates)
    )
    v = commit_snapshot(merged, root, "merge batch 1")
    got = {
        r["n_nationkey"]: r["n_name"]
        for r in read_snapshot(spark, root, v).collect()
    }
    assert got[0] == "RENAMED" and got[999] == "BRAND-NEW"
    assert read_snapshot(spark, root, 1).filter(
        F.col("n_name") == "RENAMED"
    ).count() == 0  # history untouched


def test_compaction_apply_crash_leaves_v1_visible(spark, sf_dir, root):
    """Failure injection for the compaction-apply rewrite (round 11):
    a compactor that stages the bin-partitioned v2 data but dies before
    the manifest publish must leave v1 the visible latest — readers see
    the pre-compaction table, and a re-run apply commits a clean v2."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    )
    commit_snapshot(docs, root, "v1: pre-compaction")
    n1 = read_snapshot(spark, root).count()
    # crashed compactor: bin-partitioned data staged, no manifest
    staged = os.path.join(root, "data", "v=000002")
    (
        docs.withColumn("bin_id", F.pmod("doc_id", F.lit(8)))
        .repartition("bin_id")
        .write.mode("overwrite")
        .partitionBy("bin_id")
        .parquet(staged)
    )
    assert list_versions(root) == [1]
    assert read_snapshot(spark, root).count() == n1  # latest is still v1
    # recovery: a clean re-run overwrites the orphan and publishes
    v = commit_snapshot(
        docs.withColumn("bin_id", F.pmod("doc_id", F.lit(8))).repartition(
            "bin_id"
        ),
        root,
        "v2: compacted (recovered)",
        partition_by=["bin_id"],
    )
    assert v == 2
    v2 = read_snapshot(spark, root, 2)
    assert v2.count() == n1  # row identity survives the rewrite
    assert (
        v2.agg(F.sum("n_chars")).first()[0]
        == docs.agg(F.sum("n_chars")).first()[0]
    )


def test_partitioned_snapshot_layout(spark, sf_dir, root):
    """partition_by commits land hive-partitioned under the version dir
    and read back with the partition column intact."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    v = commit_snapshot(
        docs.withColumn("b", F.pmod("doc_id", F.lit(4))).repartition("b"),
        root,
        "binned",
        partition_by=["b"],
    )
    ddir = os.path.join(root, "data", f"v={v:06d}")
    bins = sorted(d for d in os.listdir(ddir) if d.startswith("b="))
    assert bins == ["b=0", "b=1", "b=2", "b=3"]
    back = read_snapshot(spark, root, v)
    assert back.count() == docs.count()
    assert set(back.columns) == {"doc_id", "n_chars", "b"}


def test_vacuum_removes_orphans_and_expired_only(spark, sf_dir, root):
    """vacuum(retain_last=1): orphan staged dirs and expired snapshots
    (data + manifest) are deleted, the retained snapshot is untouched
    and still readable, and expired time travel now raises."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    commit_snapshot(docs.repartition(4), root, "v1")
    # crashed writer: staged data, manifest never published
    docs.repartition(2).write.parquet(os.path.join(root, "data", "v=000042"))
    commit_snapshot(docs.repartition(3), root, "v2")
    # the orphan is invisible to readers before vacuum
    assert list_versions(root) == [1, 2]
    stats = vacuum(root, retain_last=1)
    assert stats["orphan_dirs_removed"] == 1
    assert stats["orphan_files_removed"] == 2
    assert stats["expired_versions"] == 1
    assert stats["expired_files_removed"] == 4
    assert stats["kept_versions"] == [2]
    assert stats["kept_files"] == 3
    assert list_versions(root) == [2]
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root, 1)
    assert read_snapshot(spark, root).count() == docs.count()
    # idempotent: a second vacuum finds nothing to do
    again = vacuum(root, retain_last=1)
    assert again["orphan_dirs_removed"] == 0
    assert again["expired_versions"] == 0
    assert again["kept_files"] == 3


def test_vacuum_retains_multiple_versions(spark, sf_dir, root):
    """retain_last=2 keeps both snapshots readable — only orphans go."""
    docs = t(spark, sf_dir, "documents").select("doc_id")
    commit_snapshot(docs.repartition(2), root, "v1")
    commit_snapshot(docs.repartition(2), root, "v2")
    docs.repartition(1).write.parquet(os.path.join(root, "data", "v=000007"))
    stats = vacuum(root, retain_last=2)
    assert stats["orphan_dirs_removed"] == 1
    assert stats["expired_versions"] == 0
    assert list_versions(root) == [1, 2]
    assert read_snapshot(spark, root, 1).count() == docs.count()
