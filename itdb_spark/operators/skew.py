"""Skew-handling operators: salted two-phase aggregation and salted join.

AQE's skew-join splitting handles most runtime skew; explicit salting is
for the cases the optimizer can't see — a groupBy where one key holds half
the table (the reference's own data has exactly this shape: the "Library"
playlist contains every track, FIXTURES.md), or a join key with a
pathological hot value.

Salted agg = two shuffles of small data instead of one shuffle with a
straggler: phase 1 groups on (key, salt) spreading the hot key over N
partitions; phase 2 merges the N partials per key."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame, keys: Sequence[str], n_salts: int = 16, cnt_alias: str = "cnt"
) -> DataFrame:
    """COUNT(*) per key, skew-proof. Equivalent to
    ``df.groupBy(*keys).count()`` — the equivalence is the oracle check."""
    salt = (F.spark_partition_id() % n_salts).alias("_salt")
    phase1 = df.groupBy(*[F.col(k) for k in keys], salt).agg(F.count("*").alias("_partial"))
    return phase1.groupBy(*keys).agg(F.sum("_partial").alias(cnt_alias))


def salted_sum(
    df: DataFrame, keys: Sequence[str], value: Column, n_salts: int = 16, alias: str = "total"
) -> DataFrame:
    """SUM(value) per key via salt+merge (value must be re-aggregatable:
    sum/count/min/max; avg decomposes to sum+count)."""
    salt = (F.spark_partition_id() % n_salts).alias("_salt")
    phase1 = df.groupBy(*[F.col(k) for k in keys], salt).agg(F.sum(value).alias("_partial"))
    return phase1.groupBy(*keys).agg(F.sum("_partial").alias(alias))
