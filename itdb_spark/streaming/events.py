"""Structured Streaming over the events table.

The reference has no streaming engine — its incrementality is mtime gates
and anti-joins (SURVEY.md §2.9). Here the events fixture flows through a
real readStream with watermarked tumbling windows; `Trigger.AvailableNow`
is the batch-incremental mode that replaces the reference's
`.loaded`-marker freshness gate (itdbloader.py:78-103)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from itdb_spark.catalog import EVENTS_RAW_SCHEMA

# ts is TIMESTAMP(MICROS) in the parquet — native TimestampType under the
# pinned schema (readStream requires an explicit schema regardless); see
# the EVENTS_RAW_SCHEMA comment in catalog.py for the regen history.
EVENTS_SCHEMA = EVENTS_RAW_SCHEMA


def windowed_counts_stream(
    spark: SparkSession, sf_dir: str, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """readStream → watermark → tumbling-window agg. Watermark bounds state:
    windows older than max(event time) − watermark are finalized and
    evicted — the late-data semantics the reference never had."""
    events = (
        spark.readStream.format("parquet")
        .schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return (
        # NULL-ts events are defined out of time windows (F.window drops
        # them silently; the filter makes the rule explicit, matching the
        # batch twin and oracle)
        events.where(F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(
            F.count("*").alias("cnt"),
            # integer cents: state-merge order can't perturb the sum, so the
            # streaming result is bit-identical to the batch twin / oracle
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "event_type",
            "cnt",
            "value_cents",
        )
    )


def run_available_now(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drive a streaming DataFrame to completion over the currently-available
    input (Trigger.AvailableNow semantics via processAllAvailable) and
    return the materialized result from the memory sink."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def streaming_dedup(
    spark: SparkSession, source_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup: dropDuplicatesWithinWatermark on event_id —
    the training-data ingest guard against replayed/duplicated input
    batches. State holds only ids younger than the watermark, so memory
    is bounded by the dedup horizon, not the stream length."""
    events = (
        spark.readStream.format("parquet")
        .schema(EVENTS_SCHEMA)
        .load(source_dir)
    )
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def rocksdb_state_conf() -> dict[str, str]:
    """The production state-store posture for every live streaming query
    in this package (SCALE.md "State-store backend"): the default
    HDFS-backed provider keeps each partition's entire state map in
    executor HEAP — sessionization / streaming dedup over billions of keys
    OOMs there first. RocksDB spills state to local disk and, with
    changelog checkpointing, ships only per-batch deltas to the checkpoint
    location instead of full snapshots.

    Apply at session build time (state-store provider cannot change across
    a restart of the same checkpointed query):

        builder = SparkSession.builder
        for k, v in rocksdb_state_conf().items():
            builder = builder.config(k, v)

    The sf-scale gate queries stay on the default provider — their state
    fits heap and the RocksDB JNI lib isn't guaranteed present in minimal
    test containers."""
    provider = (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    return {
        "spark.sql.streaming.stateStore.providerClass": provider,
        # ship per-batch changelogs, not full RocksDB snapshots
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
        # bound native memory: block-cache + memtable under one cap
        "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage": "true",
    }


def freshness_gate(source_path: str, marker_path: str) -> bool:
    """The reference's mtime freshness gate (itdbloader.py:78-103): returns
    True when the source is newer than the `.loaded` marker (work needed)."""
    if not os.path.exists(marker_path):
        return True
    return os.path.getmtime(source_path) > os.path.getmtime(marker_path)
