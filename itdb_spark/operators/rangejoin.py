"""Bucketized range join: point-in-interval joins without a native range
join (Spark lacks one; SURVEY.md §2.3 notes the reference has none
either). Naive form is a cross join + filter — O(|points|·|intervals|).

Scale form implemented here: quantize time into fixed buckets, explode
each interval into the buckets it overlaps (intervals are bounded, so
≤ ceil(len/bucket)+1 rows each), equi-join points on bucket, then apply
the exact range predicate. The shuffle is on bucket ids — cardinality
|points| + Σ interval-buckets, never the cross product. Equivalence with
the naive BETWEEN join is the oracle/test contract."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_count(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    interval_id: str,
    bucket_seconds: int = 604800,
) -> DataFrame:
    """(interval_id, cnt): number of points with start ≤ ts < end.

    ``bucket_seconds`` should be ≥ the typical interval length so most
    intervals explode into ≤ 2 bucket rows."""
    p = points.select(
        F.col(point_ts).alias("ts"),
        (F.unix_timestamp(point_ts) / bucket_seconds).cast("long").alias("bucket"),
    )
    iv = intervals.select(
        F.col(interval_id).alias("ivl_id"),
        F.col(start_ts).alias("start"),
        F.col(end_ts).alias("end"),
        F.explode(
            F.sequence(
                (F.unix_timestamp(start_ts) / bucket_seconds).cast("long"),
                (F.unix_timestamp(end_ts) / bucket_seconds).cast("long"),
            )
        ).alias("bucket"),
    )
    joined = p.join(iv, "bucket").where(
        (F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end"))
    )
    return joined.groupBy(F.col("ivl_id").alias(interval_id)).agg(F.count("*").alias("cnt"))


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 604800,
) -> DataFrame:
    """Interval × interval OVERLAP join (l.start ≤ r.end AND r.start ≤
    l.end, closed intervals), bucketized: both sides explode into the
    time buckets they span and equi-join on bucket. Each overlapping pair
    shares at least the bucket containing max(l.start, r.start) — the
    overlap's own start — so keeping ONLY the match in that bucket emits
    every pair exactly once with NO distinct/dedup shuffle afterwards.
    Shuffle cardinality is Σ interval-bucket rows, never |L|·|R|.

    Returns (left_id, right_id) pairs. Both inputs must carry
    ``start_col``/``end_col`` timestamps."""

    def spans(df: DataFrame, id_col: str, tag: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"{tag}_id"),
            F.col(start_col).alias(f"{tag}_s"),
            F.col(end_col).alias(f"{tag}_e"),
            F.explode(
                F.sequence(
                    (F.unix_timestamp(start_col) / bucket_seconds).cast("long"),
                    (F.unix_timestamp(end_col) / bucket_seconds).cast("long"),
                )
            ).alias("bucket"),
        )

    l = spans(left, left_id, "l")
    r = spans(right, right_id, "r")
    overlap_start_bucket = (
        F.unix_timestamp(F.greatest("l_s", "r_s")) / bucket_seconds
    ).cast("long")
    return (
        l.join(r, "bucket")
        .where(
            (F.col("l_s") <= F.col("r_e"))
            & (F.col("r_s") <= F.col("l_e"))
            & (F.col("bucket") == overlap_start_bucket)
        )
        .select(F.col("l_id").alias(left_id), F.col("r_id").alias(right_id))
    )


def range_join_naive(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    interval_id: str,
) -> DataFrame:
    """Reference implementation: cross join + BETWEEN filter (what the SQL
    oracle runs). Correct at any scale where |points|·|intervals| fits."""
    j = points.crossJoin(intervals).where(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    )
    return j.groupBy(F.col(interval_id)).agg(F.count("*").alias("cnt"))
