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

def test_synth_partsupp_shape(spark, sf_dir):
    """The synthesized partsupp (tpch_partsupp.synth_partsupp) must be
    a valid TPC-H-style catalog: exactly 4 DISTINCT suppliers per part
    (the formula's spacing argument), every ps_suppkey a real supplier
    key, and all derived columns in their documented ranges."""
    from pyspark.sql import functions as F

    from khose_spark.operators.tpch_partsupp import synth_partsupp
    from khose_spark.tables import t

    ps = synth_partsupp(spark, sf_dir)
    n_parts = t(spark, sf_dir, "part").count()
    n_supp = t(spark, sf_dir, "supplier").count()
    assert ps.count() == 4 * n_parts
    per_part = ps.groupBy("ps_partkey").agg(
        F.countDistinct("ps_suppkey").alias("k")
    )
    assert per_part.filter(F.col("k") != 4).count() == 0
    bad = ps.filter(
        (F.col("ps_suppkey") < 0) | (F.col("ps_suppkey") >= n_supp)
        | (F.col("ps_availqty") < 1) | (F.col("ps_availqty") > 9999)
        | (F.col("ps_costcents") < 100) | (F.col("ps_costcents") > 99999)
    )
    assert bad.count() == 0


def test_pq_index_build_is_memoized(spark, sf_dir):
    """build_pq_index must be build-once-search-many WITHIN a session:
    the second call returns the same catalog tables without rewriting."""
    import os

    from khose_spark.operators.similarity import build_pq_index

    codes1, cb1 = build_pq_index(spark, sf_dir)
    loc1 = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {codes1}")
        .filter("col_name = 'Location'")
        .first()["data_type"]
    )
    mtime1 = max(
        os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(loc1.replace("file:", ""))
        for f in fs
    )
    codes2, cb2 = build_pq_index(spark, sf_dir)
    assert (codes1, cb1) == (codes2, cb2)
    mtime2 = max(
        os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(loc1.replace("file:", ""))
        for f in fs
    )
    assert mtime1 == mtime2, "second build rewrote the index files"


def test_kafka_sim_pipeline_end_to_end(spark, sf_dir, tmp_path):
    """The kafka branch of the pipeline compiler, minus the socket: the
    simulator presents the EXACT Kafka source schema and the config
    routes through the same decode_kafka_value stage as kind="kafka",
    so everything downstream of the broker is covered end to end."""
    from khose_spark.sources import KAFKA_SOURCE_SCHEMA, kafka_sim_stream

    chunks = stage_event_chunks(spark, sf_dir, tag="kafka_pipeline")
    # envelope contract: same column names and types as Spark's kafka
    # source schema (nullability differs — literal columns plan as
    # non-nullable, which only widens what consumers must accept)
    env = kafka_sim_stream(spark, chunks, topic="events")
    assert [(f.name, f.dataType) for f in env.schema.fields] == [
        (f.name, f.dataType) for f in KAFKA_SOURCE_SCHEMA.fields
    ]

    cfg = {
        "source": {"kind": "kafka_sim", "path": chunks, "topic": "events"},
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
            "path": str(tmp_path / "kout"),
            "format": "parquet",
            "partition_by": ["event_type", "d"],
            "checkpoint": str(tmp_path / "kckpt"),
        },
    }
    run_pipeline(spark, cfg)
    out = spark.read.parquet(cfg["sink"]["path"])
    twin = t(spark, sf_dir, "events").filter(
        F.expr("event_type IN ('click', 'purchase') AND value > 0")
    )
    assert out.count() == twin.count()
    # value-level roundtrip through the binary envelope: ids, event
    # times (µs precision) and doubles all survive encode/decode
    a = out.agg(
        F.sum("event_id"), F.sum(F.unix_micros("ts")), F.round(F.sum("value"), 6)
    ).first()
    b = twin.agg(
        F.sum("event_id"), F.sum(F.unix_micros("ts")), F.round(F.sum("value"), 6)
    ).first()
    assert tuple(a) == tuple(b)
