"""Streaming runtime pieces (SURVEY.md §2.9, §3.2 EP3).

Everything here runs with ``trigger(availableNow=True)`` in tests —
drain-the-backlog-and-stop — which exercises the same incremental
planner, state store, and commit protocol as a long-running stream.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def ingest_to_parquet(
    events_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """khose's defining pipeline: stream -> immutable, hive-partitioned
    parquet, EXACTLY ONCE (BASELINE.json: "streaming ingest ... to
    immutable storage").

    Uses Spark's native streaming file sink: the per-batch file manifest
    in ``_spark_metadata`` + the checkpoint WAL give exactly-once file
    output — a restarted/replayed query never double-writes a batch.
    Partitioning by (event_type, day) is the 100 TB layout: partition
    pruning turns one-day queries into one-directory scans."""
    q = (
        events_stream.withColumn("d", F.date_format("ts", "yyyy-MM-dd"))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("event_type", "d")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_to_memory(
    df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
) -> None:
    """Drain a (finite) streaming DataFrame into an in-memory table for
    test assertions."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


_SPEND_STATE_SCHEMA = T.StructType([T.StructField("total", T.DoubleType())])
_SPEND_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("cum_spend", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _spend_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Custom stateful operator: cumulative per-user purchase spend.
    State = running total, carried across micro-batches in the state
    store; emits the updated total once per (user, batch). ``n_events``
    counts the rows this batch delivered for the group — a function of
    batch CONTENT only (Arrow chunk splitting varies run-to-run and must
    never leak into the emitted schema)."""
    total = state.get[0] if state.exists else 0.0
    n_events = 0
    for pdf in pdfs:
        purchases = pdf.loc[pdf["event_type"] == "purchase", "value"]
        total += float(purchases.sum())
        n_events += len(pdf)
    state.update((total,))
    yield pd.DataFrame(
        {"user_id": [key[0]], "cum_spend": [round(total, 2)], "n_events": [n_events]}
    )


def stateful_running_spend(events_stream: DataFrame) -> DataFrame:
    """applyInPandasWithState pipeline: per-user cumulative spend with
    explicit state (SURVEY.md §2.9 stream-stateful). The arbitrary-state
    API is the escape hatch for semantics windows can't express —
    sessionized spend caps, fraud counters, per-entity model state."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _spend_fn,
        outputStructType=_SPEND_OUT_SCHEMA,
        stateStructType=_SPEND_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def checkpoint_dirs(base: str) -> tuple[str, str]:
    """(out_dir, checkpoint_dir) pair under a base scratch dir."""
    return os.path.join(base, "out"), os.path.join(base, "ckpt")
