"""SparkSession factory and per-query session preparation.

Determinism laws (SURVEY.md §0.2, §4.2.5): the session MUST run in UTC
(timestamp hashing vs the DuckDB oracle breaks otherwise) and with AQE
on. ``prep_session`` applies the runtime-settable subset to a session we
did not create (the driver passes its own session into ``queries()``).
"""

from __future__ import annotations

import os
import warnings

from pyspark.sql import SparkSession

# Runtime-settable confs applied to every session (ours or the driver's).
_RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # events.parquet stores TIMESTAMP(NANOS), which Spark's parquet reader
    # rejects by default; read as long and convert (tables.t handles it).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Fixture scale (sf<=0.1) fits comfortably in 32 partitions; AQE
    # coalesces further. At 100 TB this would be sized to cluster cores.
    "spark.sql.shuffle.partitions": os.environ.get("KHOSE_SHUFFLE_PARTITIONS", "32"),
}


def get_spark(app_name: str = "khose-spark") -> SparkSession:
    """Create (or get) a local SparkSession with the engine's defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("KHOSE_MASTER", f"local[{cpus}]"))
        .config("spark.driver.memory", os.environ.get("KHOSE_DRIVER_MEMORY", "16g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    prep_session(spark)
    return spark


# Confs whose effective value is determinism-critical: a silent failure
# to set these makes every timestamp/decimal-hashing query diverge from
# the DuckDB oracle with no diagnostic.
_CRITICAL_CONFS = (
    "spark.sql.session.timeZone",
    "spark.sql.legacy.parquet.nanosAsLong",
)


def prep_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable determinism/perf confs to an existing session.

    After applying, read the determinism-critical keys back and warn
    loudly if the effective value diverges (e.g. a driver-provided
    session that locks its timezone) — parity failures are otherwise
    undiagnosable."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf locked by cluster admin
            pass
    for k in _CRITICAL_CONFS:
        want = _RUNTIME_CONFS[k]
        try:
            got = spark.conf.get(k)
        except Exception:  # pragma: no cover
            got = None
        if got != want:  # pragma: no cover - only on locked sessions
            warnings.warn(
                f"prep_session: determinism-critical conf {k}={got!r} "
                f"(wanted {want!r}) could not be applied; oracle "
                "hash-parity WILL break for affected queries",
                RuntimeWarning,
                stacklevel=2,
            )
    return spark
