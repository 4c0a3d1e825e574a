"""Streaming-shaped queries — SURVEY.md §2.9. The oracle-checked entries use
the batch equivalents of the streaming operators (window(), lag-based
sessionization) — identical semantics, DuckDB-reproducible; the true
readStream path is exercised in tests/test_streaming.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from itdb_spark.catalog import Tables
from itdb_spark.queries import register


@register(
    "stream-window",
    oracle="""
    SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS window_start,
           event_type, count(*) AS cnt,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events GROUP BY 1, 2
    """,
    doc="Tumbling event-time window aggregation — the Structured Streaming "
    "windowed agg (with watermark) run over the same data in batch mode; "
    "the readStream twin is streaming/events.py (tested in "
    "tests/test_streaming.py).",
    bench=True,
)
def stream_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "event_type",
            "cnt",
            "value_cents",
        )
    )


_STREAM_WINDOW_ORACLE = """
    SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS window_start,
           event_type, count(*) AS cnt,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events GROUP BY 1, 2
"""


@register(
    "stream-window-live",
    oracle=_STREAM_WINDOW_ORACLE,
    doc="The SAME windowed aggregation computed by an actual Structured "
    "Streaming query: readStream → watermark → tumbling windows → memory "
    "sink, driven to completion, result returned — a real streaming "
    "execution inside the oracle gate (stream-window is the batch twin).",
)
def stream_window_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    from itdb_spark.streaming.events import run_available_now, windowed_counts_stream

    stream_df = windowed_counts_stream(spark, sf_dir, window="1 hour")
    return run_available_now(stream_df, "stream_window_live_sink")


@register(
    "stream-session",
    oracle="""
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions FROM (
      SELECT user_id,
             CASE WHEN prev_ts IS NULL
                       OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END
               AS new_session
      FROM (
        SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
      )
    ) GROUP BY user_id
    """,
    doc="Sessionization with a 30-minute inactivity gap: lag(ts) + gap "
    "flag + sum per user — the batch twin of session_window(ts, gap) "
    "(applyInPandasWithState covers richer custom state at deploy time).",
    bench=True,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = 1800
    flagged = t.events.select(
        "user_id",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
    ).select(
        "user_id",
        F.when(
            F.col("prev_ts").isNull()
            | (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts") > gap_s),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    return flagged.groupBy("user_id").agg(F.sum("new_session").cast("long").alias("n_sessions"))
