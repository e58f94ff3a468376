"""transformWithStateInPandas stateful operator (Spark 4's arbitrary-
state API, successor to applyInPandasWithState — SURVEY.md §2.9
stream-stateful).

Same semantics as ``runtime.stateful_running_spend`` (per-user
cumulative purchase spend), rebuilt on the new API: explicit
``ValueState`` registered in ``init``, per-batch updates in
``handleInputRows``. The new API is the 100 TB choice — state lives in
per-partition RocksDB instances (changelog-checkpointed), state types
are schema'd, and timers replace the single timeout knob.

Requires the RocksDB state store provider; ``running_spend_tws`` sets it
on the session (transformWithState refuses the default HDFS-backed
provider). NOTE: the JVM↔Python state protocol needs ``google.protobuf``
— absent in this container, so the convergence test skips here and the
legacy ``applyInPandasWithState`` twin carries the tested coverage;
this module is the documented production path on a normally-provisioned
cluster.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("cum_spend", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("total", T.DoubleType())])


class RunningSpendProcessor(StatefulProcessor):
    """Per-user cumulative purchase spend with explicit ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._total = handle.getValueState("total", _STATE_SCHEMA)

    def handleInputRows(
        self,
        key: Any,
        rows: Iterator[pd.DataFrame],
        timerValues: Any,
    ) -> Iterator[pd.DataFrame]:
        total = self._total.get()[0] if self._total.exists() else 0.0
        for pdf in rows:
            purchases = pdf.loc[pdf["event_type"] == "purchase", "value"]
            total += float(purchases.sum())
        self._total.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "cum_spend": [round(total, 2)]})

    def close(self) -> None:
        pass


def running_spend_tws(events_stream: DataFrame) -> DataFrame:
    """Wire the processor onto a keyed event stream (update mode, no
    event-time timers needed for a pure running total)."""
    spark = events_stream.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningSpendProcessor(),
        outputStructType=OUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
