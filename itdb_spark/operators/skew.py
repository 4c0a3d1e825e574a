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


def skew_safe_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    hot_keys: DataFrame | None = None,
    hot_threshold: int = 10_000,
) -> DataFrame:
    """Inner equi-join that survives a pathological hot key on the FACT
    (left) side: split-broadcast-union.

    1. Pre-flight (unless ``hot_keys`` is given): per-key counts on the
       left — map-side combined, so the shuffle carries one row per
       (key, partition) — keep keys over ``hot_threshold``. Hot keys are
       by definition FEW (each accounts for >threshold rows), so the hot
       set always broadcasts; nothing is ever collected to the driver.
    2. Hot slice: left rows with a hot key join the hot slice of the
       right side via BROADCAST hash join — the hot key never shuffles,
       so no reducer receives the monster key's row mass.
    3. Cold slice: everything else takes the normal shuffled join — keys
       are ≤ threshold there, so partitions stay balanced.
    4. unionByName of the two — semantically identical to the plain join
       (the oracle twin of join-salted IS the plain join).

    When to use over AQE's skew-join split: AQE rebalances SMJ partitions
    at runtime but (a) does nothing for the hot key's *row mass concentrated
    on one reducer* when the join must be shuffled-hash, (b) is unavailable
    in streaming-batch joins, and (c) acts after a straggler is already
    scheduled. The pre-flight (agg-skewcheck) decides: plain join below
    threshold, this operator above it.
    """
    keys = list(keys)
    if hot_keys is None:
        from itdb_spark.plans.library import truncate_lineage

        hot_keys = (
            left.groupBy(*keys)
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") > hot_threshold)
            .select(*keys)
        )
        # Materialize the pre-flight ONCE (eager, tiny result): the hot-key
        # subtree feeds three join sites (semi, anti, right-semi) — left
        # lazy, each site would re-aggregate the fact table unless AQE's
        # exchange reuse happens to fire. One explicit job beats hoping.
        hot_keys = truncate_lineage(hot_keys, eager=True)
    hot = F.broadcast(hot_keys)
    left_hot = left.join(hot, keys, "left_semi")
    left_cold = left.join(hot, keys, "left_anti")
    right_hot = right.join(hot, keys, "left_semi")
    return left_cold.join(right, keys, "inner").unionByName(
        left_hot.join(F.broadcast(right_hot), keys, "inner")
    )
