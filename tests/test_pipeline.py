"""Config-driven pipeline tests: a khose-style JSON config drains the
simulated stream into partitioned immutable parquet, exactly once, with
filter/projection applied inside Catalyst."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from khose_spark.pipeline import build_pipeline, run_pipeline
from khose_spark.sources import stage_event_chunks
from khose_spark.tables import t


def _config(chunks: str, tmp_path) -> dict:
    return {
        "source": {"kind": "kinesis_sim", "path": chunks},
        "transform": {
            "filter": "event_type IN ('click', 'purchase') AND value > 0",
            "columns": {
                "event_id": "event_id",
                "ts": "ts",
                "user_id": "user_id",
                "event_type": "event_type",
                "value": "value",
                "d": "date_format(ts, 'yyyy-MM-dd')",
            },
        },
        "sink": {
            "path": str(tmp_path / "out"),
            "format": "parquet",
            "partition_by": ["event_type", "d"],
            "checkpoint": str(tmp_path / "ckpt"),
        },
    }


def test_pipeline_end_to_end(spark, sf_dir, tmp_path):
    chunks = stage_event_chunks(spark, sf_dir, tag="pipeline")
    cfg = _config(chunks, tmp_path)
    # config round-trips through JSON like a real deployment file
    cfg_path = tmp_path / "pipeline.json"
    cfg_path.write_text(json.dumps(cfg))
    run_pipeline(spark, str(cfg_path))

    out = spark.read.parquet(cfg["sink"]["path"])
    twin = (
        t(spark, sf_dir, "events")
        .filter(F.expr("event_type IN ('click', 'purchase') AND value > 0"))
    )
    assert out.count() == twin.count()
    assert out.agg(F.sum("event_id")).first()[0] == twin.agg(F.sum("event_id")).first()[0]
    # partition columns materialized as hive dirs
    assert (tmp_path / "out" / "event_type=click").exists()

    # partition-pruned read touches one (event_type, d) directory
    one_day = out.filter(
        (F.col("event_type") == "click") & (F.col("d") == out.select("d").first()[0])
    )
    assert one_day.count() > 0

    # exactly-once: rerunning the same config/checkpoint adds nothing
    run_pipeline(spark, cfg)
    assert spark.read.parquet(cfg["sink"]["path"]).count() == twin.count()


def test_pipeline_plan_stays_in_codegen(spark, sf_dir, tmp_path):
    """The declarative transform must not introduce Python evaluation."""
    chunks = stage_event_chunks(spark, sf_dir, tag="pipeline")
    df = build_pipeline(spark, _config(chunks, tmp_path))
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "pythonUDF" not in plan and "PythonUDF" not in plan