"""Kinesis-envelope stream source (simulator) — SURVEY.md §4.2.2.

khose's primary sources are Kafka and Kinesis (BASELINE.json). In OSS
Spark, Kafka is built in (``spark.readStream.format("kafka")`` — see
``kafka_stream`` below); Kinesis is NOT — production deployments use a
connector from the Spark-Kinesis family (e.g. the spark-sql-kinesis
connector or Kinesis->Kafka bridging), all of which present a record
envelope equivalent to the one simulated here.

The simulator stages fixture events as ordered chunk files and replays
them through Spark's FILE STREAM source wrapped in the Kinesis record
envelope (shardId, sequenceNumber, data, approximateArrivalTimestamp).
Everything downstream of the source — parse, transform, window, sink —
is identical code for real Kinesis, real Kafka, and the simulator;
that's the point: the envelope is the interface.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from khose_spark.tables import t


def _events_schema():
    # Lazy: operators.scans lives behind the operators package __init__,
    # which (via stream_curation) imports this module back.  A module-
    # level import here breaks any entry point that imports this module
    # before the operators package (circular partial-init ImportError,
    # e.g. `import khose_spark.pipeline` standalone).
    from khose_spark.operators.scans import EVENTS_SCHEMA

    return EVENTS_SCHEMA


ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("shardId", T.StringType()),
        T.StructField("sequenceNumber", T.StringType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("approximateArrivalTimestamp", T.TimestampType()),
    ]
)

_N_SHARDS = 4

# Explicit microsecond format on BOTH encode and decode — the default
# JSON timestampFormat truncates to millis, which would silently lose
# event-time precision through the envelope.
_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _stage_chunks(df, key_col: str, out: str, n_chunks: int) -> str:
    """Write ``df`` as ``n_chunks`` key-ranged parquet files with
    mtimes following the part index — the shared staging core of the
    event and document stream histories."""
    (
        df.repartitionByRange(n_chunks, key_col)
        .write.mode("overwrite")
        .parquet(out)
    )
    # Spark's file-stream source replays in MODIFICATION-TIME order, and
    # fresh part files carry task-completion order — random. Rewrite
    # mtimes to follow the part index (= key = arrival order) so replay
    # is deterministic and arrival-ordered, like a real stream. Without
    # this, a late-listed early chunk can arrive behind an advanced
    # watermark and be dropped, making convergence tests flaky.
    parts = sorted(
        f for f in os.listdir(out) if f.startswith("part-") and f.endswith(".parquet")
    )
    base_mtime = int(os.path.getmtime(out))
    for i, fname in enumerate(parts):
        p = os.path.join(out, fname)
        os.utime(p, (base_mtime + i, base_mtime + i))
    return out


def _chunk_dir(sf_dir: str, tag: str) -> str:
    # Scope staging per PROCESS: two concurrent test/bench runs with the
    # same (sf_dir, tag) must not overwrite each other's chunk files or
    # race the mtime rewrite against an active file-stream reader.
    return os.path.join(
        tempfile.gettempdir(),
        "khose_stream",
        f"pid{os.getpid()}",
        f"chunks_{hashlib.md5((sf_dir + tag).encode()).hexdigest()[:8]}",
    )


def stage_event_chunks(
    spark: SparkSession, sf_dir: str, n_chunks: int = 8, tag: str = ""
) -> str:
    """Write fixture events as ``n_chunks`` ordered parquet files — the
    replayable 'stream history'. Chunked by event_id range so replay
    order is deterministic."""
    return _stage_chunks(
        t(spark, sf_dir, "events"),
        "event_id",
        _chunk_dir(sf_dir, tag),
        n_chunks,
    )


def stage_document_chunks(
    spark: SparkSession, sf_dir: str, n_chunks: int = 4, tag: str = "docs"
) -> str:
    """Documents as a replayable stream history — the corpus-refresh
    ingest shape (q_stream_curation_e2e_batchsem): each chunk is one
    doc_id range, arriving in id order like a crawler's upload batches."""
    return _stage_chunks(
        t(spark, sf_dir, "documents"),
        "doc_id",
        _chunk_dir(sf_dir, "documents" + tag),
        n_chunks,
    )


def file_stream(spark: SparkSession, chunk_dir: str, files_per_trigger: int = 1) -> DataFrame:
    """Raw event file-stream: one micro-batch per chunk file."""
    return (
        spark.readStream.schema(_events_schema())
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(chunk_dir)
    )


def kinesis_stream(
    spark: SparkSession, chunk_dir: str, files_per_trigger: int = 1
) -> DataFrame:
    """Streaming DataFrame in the Kinesis record envelope: each event
    becomes (shardId, sequenceNumber, data=JSON bytes, arrival ts).

    ``files_per_trigger`` is the throughput/latency knob: 1 replays one
    chunk per micro-batch (max batches — what the convergence tests
    want, since they assert per-batch semantics), larger values
    amortize the fixed per-batch cost (incremental planning + WAL +
    manifest commit) over more rows — the setting a throughput-bound
    production ingest runs with."""
    raw = file_stream(spark, chunk_dir, files_per_trigger=files_per_trigger)
    payload = F.to_json(
        F.struct("event_id", "ts", "user_id", "event_type", "value", "props"),
        {"timestampFormat": _TS_FMT},
    )
    return raw.select(
        F.concat(F.lit("shardId-"), F.lpad((F.col("user_id") % _N_SHARDS).cast("string"), 12, "0")).alias("shardId"),
        F.col("event_id").cast("string").alias("sequenceNumber"),
        F.encode(payload, "utf-8").alias("data"),
        F.col("ts").alias("approximateArrivalTimestamp"),
    )


def parse_envelope(envelope: DataFrame) -> DataFrame:
    """Decode a Kinesis-envelope stream back into typed event rows —
    the first stage of every khose pipeline (deserialize JSON)."""
    parsed = F.from_json(
        F.decode("data", "utf-8"),
        _events_schema(),
        {"timestampFormat": _TS_FMT},
    )
    return envelope.select(parsed.alias("e")).select("e.*")


DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def document_kinesis_stream(
    spark: SparkSession, chunk_dir: str, files_per_trigger: int = 1
) -> DataFrame:
    """Documents in the SAME Kinesis record envelope as events — a
    corpus-refresh producer uploads document records exactly like an
    event producer does (shard by key, JSON payload, sequence = id).
    Arrival timestamp is a deterministic function of doc_id so replay
    is reproducible (documents carry no event time of their own)."""
    raw = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(chunk_dir)
    )
    payload = F.to_json(
        F.struct("doc_id", "text", "lang", "source", "n_chars")
    )
    return raw.select(
        F.concat(
            F.lit("shardId-"),
            F.lpad((F.col("doc_id") % _N_SHARDS).cast("string"), 12, "0"),
        ).alias("shardId"),
        F.col("doc_id").cast("string").alias("sequenceNumber"),
        F.encode(payload, "utf-8").alias("data"),
        F.timestamp_seconds(F.col("doc_id")).alias(
            "approximateArrivalTimestamp"
        ),
    )


def parse_document_envelope(envelope: DataFrame) -> DataFrame:
    """Decode a Kinesis-envelope DOCUMENT stream back into typed rows —
    the deserialize stage of the corpus-refresh pipeline. JSON escaping
    makes the text roundtrip byte-exact (no newlines/quotes lost), which
    the e2e key's hash check asserts end to end."""
    parsed = F.from_json(F.decode("data", "utf-8"), DOCS_SCHEMA)
    return envelope.select(parsed.alias("d")).select("d.*")


def kafka_stream(spark: SparkSession, bootstrap: str, topic: str) -> DataFrame:
    """Production Kafka source (no broker in this container — the
    envelope-identical ``kafka_sim_stream`` covers the downstream path
    in tests, and tests/test_optional_env.py jar-gates a real smoke):
    value bytes carry the same JSON payload the simulator produces, so
    both decode through the shared ``decode_kafka_value``."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )


# The Kafka source's fixed output schema (Spark's kafka-0-10-sql
# contract): every consumer written against the simulator sees exactly
# the columns a real broker-backed stream would present.
KAFKA_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def kafka_sim_stream(
    spark: SparkSession,
    chunk_dir: str,
    topic: str = "events",
    files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming DataFrame in the exact Kafka source envelope
    (KAFKA_SOURCE_SCHEMA), replayed from staged chunk files — the
    broker-less twin of ``kafka_stream``. Mapping mirrors a
    user_id-keyed producer: key = user_id bytes (so a real topic would
    co-partition each user's events), partition = hash-bucket of the
    key, offset = event_id (monotone within the fixture), timestamp =
    event time with timestampType=0 (CreateTime). Everything downstream
    of the source — decode_kafka_value on — is byte-identical code for
    the real source."""
    raw = file_stream(spark, chunk_dir, files_per_trigger=files_per_trigger)
    payload = F.to_json(
        F.struct("event_id", "ts", "user_id", "event_type", "value", "props"),
        {"timestampFormat": _TS_FMT},
    )
    return raw.select(
        F.encode(F.col("user_id").cast("string"), "utf-8").alias("key"),
        F.encode(payload, "utf-8").alias("value"),
        F.lit(topic).alias("topic"),
        (F.col("user_id") % _N_SHARDS).cast("int").alias("partition"),
        F.col("event_id").cast("long").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )


def decode_kafka_value(raw: DataFrame) -> DataFrame:
    """Decode a Kafka-envelope stream's JSON value bytes into typed
    event rows — shared by the production source and the simulator, so
    the tested path IS the production path minus the socket."""
    parsed = F.from_json(
        F.decode("value", "utf-8"),
        _events_schema(),
        {"timestampFormat": _TS_FMT},
    )
    return raw.select(parsed.alias("e")).select("e.*")
