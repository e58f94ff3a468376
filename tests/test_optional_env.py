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
