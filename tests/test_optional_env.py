"""Environment-gated opportunistic coverage (SURVEY.md §8).

Two capabilities are blocked by the sandbox, not by this engine:

- **Avro ingest/egress** — the spark-avro DataSource is a separate jar
  not bundled with pyspark here. The test detects the jar at runtime
  and SKIPS while it is absent; the day the environment ships
  spark-avro, the roundtrip gets covered automatically with zero code
  changes.
- **transformWithStateInPandas** — needs google.protobuf for the
  JVM↔Python state protocol; its convergence test in
  tests/test_streaming.py importorskips the same way.

The point of pinning these as skips (not deletions): the skip shows up
in every test run's summary, so the gap stays visible and the coverage
is self-healing.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from khose_spark.tables import t


def _avro_available(spark) -> bool:
    try:
        spark.read.format("avro").load("/nonexistent-avro-probe")
        return True  # unreachable: path is missing
    except AnalysisException as e:
        msg = str(e)
        # missing DATA SOURCE => jar absent; missing PATH => jar present
        return "FAILED_TO_LOAD_DATA_SOURCE" not in msg and (
            "avro" not in msg.lower() or "PATH_NOT_FOUND" in msg
        )
    except Exception:
        return False


def test_avro_roundtrip_when_jar_present(spark, sf_dir):
    if not _avro_available(spark):
        pytest.skip(
            "spark-avro DataSource jar not bundled with this pyspark "
            "(SURVEY.md §8) — roundtrip auto-covers when it appears"
        )
    import shutil

    base = tempfile.mkdtemp(prefix="khose_avro_")
    try:
        orig = t(spark, sf_dir, "events")
        # Avro has no native timestamp-ntz in older spark-avro: write
        # micros-safe columns and compare checksums
        out = f"{base}/events_avro"
        orig.write.format("avro").save(out)
        back = spark.read.format("avro").load(out)
        assert back.count() == orig.count()
        assert (
            back.agg(F.sum("event_id")).first()[0]
            == orig.agg(F.sum("event_id")).first()[0]
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_protobuf_gate_status():
    """Documents (and keeps visible) the tws environment gate: when
    protobuf becomes importable, the transformWithStateInPandas
    convergence test in test_streaming.py starts running on its own —
    this probe just surfaces the current state in the summary."""
    try:
        import google.protobuf.descriptor  # noqa: F401
    except ImportError:
        pytest.skip(
            "google.protobuf absent — transformWithStateInPandas "
            "convergence test is auto-skipped (tests/test_streaming.py)"
        )


def _kafka_source_available(spark) -> bool:
    """True iff the spark-sql-kafka jar is on the classpath. Building
    the reader fails at load() with a missing-data-source error when
    the jar is absent; with the jar present (no broker needed at plan
    time) load() succeeds and exposes the source schema."""
    try:
        (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", "localhost:9")
            .option("subscribe", "probe")
            .load()
        )
        return True
    except Exception:
        # Any load() failure means the gate must SKIP, not run: an
        # unrelated environment error used to slip past the old
        # marker-string check and fail the smoke instead of skipping
        # (ADVICE r06 item 5). Availability == load() succeeded.
        return False


def test_kafka_source_schema_when_jar_present(spark):
    """Jar-gated real-Kafka smoke (SURVEY.md §8): when a
    spark-sql-kafka jar appears in the environment, prove the REAL
    source presents exactly the envelope the simulator pins
    (KAFKA_SOURCE_SCHEMA) — the contract every downstream consumer and
    khose_spark.pipeline's "kafka" branch are written against. Without
    a jar this skips visibly, like the Avro gate above."""
    if not _kafka_source_available(spark):
        pytest.skip(
            "spark-sql-kafka DataSource jar not bundled with this "
            "pyspark (SURVEY.md §8) — smoke auto-covers when it appears"
        )
    from khose_spark.sources import KAFKA_SOURCE_SCHEMA

    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", "localhost:9")
        .option("subscribe", "probe")
        .load()
    )
    got = {f.name: f.dataType for f in raw.schema.fields}
    want = {f.name: f.dataType for f in KAFKA_SOURCE_SCHEMA.fields}
    for name, dtype in want.items():
        assert got.get(name) == dtype, f"kafka source column {name}: {got.get(name)}"


def _delta_available(spark) -> bool:
    """True iff a Delta Lake jar + delta-spark bindings are usable in
    this session (needs both the sql extension and the python package;
    neither ships in this sandbox)."""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    try:
        spark.range(1).write.format("delta").mode("overwrite").save(
            tempfile.mkdtemp(prefix="khose_delta_probe_") + "/t"
        )
        return True
    except Exception:
        return False


def test_delta_time_travel_twin_when_jar_present(spark, sf_dir):
    """Jar-gated Delta twin of q_lake_time_travel (SURVEY.md §8, VERDICT
    r05 #8): when a Delta jar lands in the environment, the SAME
    commit-v1/commit-v2/read-both-versions audit must hold on a real
    Delta table (versionAsOf) exactly as it does on the lakehouse-lite
    manifest layer. Skips visibly until then."""
    if not _delta_available(spark):
        pytest.skip(
            "Delta Lake jar/bindings not present (SURVEY.md §8) — twin "
            "auto-covers when they appear"
        )
    import shutil

    root = tempfile.mkdtemp(prefix="khose_delta_tt_") + "/nation"
    try:
        nation = t(spark, sf_dir, "nation")
        nation.filter(F.col("n_regionkey") == 0).write.format("delta").save(root)
        nation.write.format("delta").mode("overwrite").save(root)
        audits = []
        for v in (0, 1):
            df = spark.read.format("delta").option("versionAsOf", v).load(root)
            audits.append(
                (v + 1, df.count(), df.agg(F.sum("n_nationkey")).first()[0])
            )
        twin = [
            (1,) + tuple(
                nation.filter(F.col("n_regionkey") == 0)
                .agg(F.count(F.lit(1)), F.sum("n_nationkey"))
                .first()
            ),
            (2,) + tuple(
                nation.agg(F.count(F.lit(1)), F.sum("n_nationkey")).first()
            ),
        ]
        assert audits == twin
    finally:
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)
