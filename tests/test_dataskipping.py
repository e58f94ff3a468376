"""File-layout data skipping (the zone-map half of the 100 TB posture).

Predicate pushdown only pays off if the FILE LAYOUT clusters the
predicate column: parquet keeps min/max stats per row group, and a
selective range predicate skips a row group only when the group's
value range excludes it. Sorting by the hot filter column at write
time (the streaming compaction pass is where this happens in the
ingest pipeline) turns a full-file scan into a touch-one-corner scan —
same query, same pushdown, ~10× less IO. This test proves the whole
chain end to end with scan METRICS (numOutputRows after row-group
pruning), not plan strings.

Engine finding (probed 2026-08-14, pinned by the xfail below): pushed
range filters on TIMESTAMP_NTZ columns do NOT engage parquet row-group
stats skipping in this Spark build — the filter appears in
PushedFilters but every group is read. The SAME data written as
adjusted-to-UTC TIMESTAMP_MICROS (what khose_spark.tables.t produces
after its NTZ normalization) prunes fine, as do bigint and date.
Consequence for the ingest layout: normalize NTZ away (or derive a
DATE column) BEFORE the sorted write — sorting raw NTZ data buys no
zone-map IO savings.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from khose_spark.tables import t

_CUTOFF = "1995-07-01"
# ~32KB row groups => dozens of groups even at sf0.001, so min/max
# pruning has real granularity to work with
_BLOCK = 32 * 1024


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("skip")
    li = t(spark, sf_dir, "lineitem").withColumn(
        "ship_date", F.to_date("l_shipdate")
    )
    (
        li.orderBy("ship_date")
        .coalesce(1)
        .write.option("parquet.block.size", _BLOCK)
        .parquet(str(base / "sorted"))
    )
    (
        li.orderBy("l_orderkey")  # shipdate uncorrelated with orderkey
        .coalesce(1)
        .write.option("parquet.block.size", _BLOCK)
        .parquet(str(base / "unsorted"))
    )
    return str(base / "sorted"), str(base / "unsorted"), li.count()


def _scan_rows(spark, path, col, lit) -> tuple[int, int]:
    """(rows the parquet reader surfaced, rows matching the predicate)
    for a range query over ``path``. AQE is disabled for the probe so
    the executed plan's leaf IS the FileSourceScan node and its
    numOutputRows metric is reachable (AQE wraps leaves in query
    stages); pruning behavior itself is identical either way."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = (
            spark.read.parquet(path)
            .filter(F.col(col) < lit)
            .agg(F.count(F.lit(1)).alias("n"))
        )
        n = df.collect()[0]["n"]
        plan = df._jdf.queryExecution().executedPlan()
        leaves = plan.collectLeaves()
        assert leaves.size() == 1
        scanned = leaves.apply(0).metrics().apply("numOutputRows").value()
        return int(scanned), int(n)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_sorted_layout_prunes_row_groups(spark, layouts):
    sorted_path, unsorted_path, total = layouts
    cutoff = F.lit(_CUTOFF).cast("date")
    scanned_sorted, n_sorted = _scan_rows(spark, sorted_path, "ship_date", cutoff)
    scanned_unsorted, n_unsorted = _scan_rows(
        spark, unsorted_path, "ship_date", cutoff
    )
    assert n_sorted == n_unsorted, "layout must not change the answer"
    # control: with shipdate scattered, min/max can exclude nothing
    assert scanned_unsorted == total, (
        f"expected full scan on unsorted layout, got {scanned_unsorted}"
    )
    # zone maps + sorted layout: only the matching prefix plus at most
    # a couple of boundary row groups comes off disk
    assert scanned_sorted < total // 2, (
        f"sorted layout scanned {scanned_sorted}/{total} rows — "
        "row-group pruning did not engage on the sorted date column"
    )


@pytest.mark.xfail(
    strict=True,
    reason="raw TIMESTAMP_NTZ range filters are pushed but do not prune "
    "parquet row groups in this Spark build — pinned so a Spark "
    "upgrade that fixes it flips this test and the ingest layout "
    "advice can be revisited",
)
def test_ntz_timestamp_pruning_engages(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("skip_ntz")
    # RAW read — bypass tables.t's NTZ→TZ normalization so the column
    # stays TIMESTAMP_NTZ end to end (the fixture's native encoding)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    from pyspark.sql import types as T

    if not isinstance(li.schema["l_shipdate"].dataType, T.TimestampNTZType):
        pytest.skip("fixture no longer ships NTZ timestamps")
    (
        li.orderBy("l_shipdate")
        .coalesce(1)
        .write.option("parquet.block.size", _BLOCK)
        .parquet(str(base / "sorted_ts"))
    )
    df0 = spark.read.parquet(str(base / "sorted_ts"))
    lit = F.lit(f"{_CUTOFF} 00:00:00").cast(df0.schema["l_shipdate"].dataType)
    scanned, n = _scan_rows(spark, str(base / "sorted_ts"), "l_shipdate", lit)
    total = li.count()
    assert scanned < total // 2, (
        f"scanned {scanned}/{total} for {n} matches — NTZ stats skipping "
        "still not engaged"
    )
