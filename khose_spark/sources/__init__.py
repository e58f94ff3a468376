"""Source adapters: stream ingestion surfaces (SURVEY.md §2.1, §4.2.2)."""

from khose_spark.sources.kinesis_sim import (  # noqa: F401
    ENVELOPE_SCHEMA,
    KAFKA_SOURCE_SCHEMA,
    decode_kafka_value,
    kafka_sim_stream,
    kinesis_stream,
    parse_envelope,
    stage_event_chunks,
)
