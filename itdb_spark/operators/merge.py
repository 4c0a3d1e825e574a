"""MERGE / upsert emulation without Delta (no lake-format jars in this
image — SURVEY.md §7.1 notes Delta MERGE as the deploy-time form).

The reference's upsert shapes:
  * REPLACE INTO (itdbloader.py:202-211)      → merge_upsert: last-writer-wins
  * delete-then-insert (itdbmetadata.py:159-176) → same, keyed delete implicit
  * ffprobe incremental (anti-join) landing   → merge_upsert appends new keys

SCD2 (validity-interval history) is the value-add the reference's
reporting layer would need for "what did my library look like in March":
close the current row, append the new version.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, pk: Sequence[str]) -> DataFrame:
    """Updates win per PK; unmatched target rows survive — MERGE WHEN
    MATCHED UPDATE / WHEN NOT MATCHED INSERT. One anti-join + union;
    both shuffle on the PK (bucket both tables by PK at scale →
    shuffle-free)."""
    keep = target.join(updates.select(*pk).distinct(), list(pk), "left_anti")
    return keep.unionByName(updates)


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    pk: Sequence[str],
    ts_col: str = "effective_ts",
    current_flag: str = "is_current",
    end_col: str = "end_ts",
) -> DataFrame:
    """Slowly-changing-dimension type 2: for each updated PK, close the
    open row (end_ts = update ts, is_current = false) and append the new
    version as current. Deterministic: one update row per PK expected
    (pre-aggregate upstream if not)."""
    upd_keys = updates.select(*pk, F.col(ts_col).alias("_new_ts")).distinct()
    closed = (
        history.join(upd_keys, list(pk), "left")
        .withColumn(
            end_col,
            F.when(
                F.col(current_flag) & F.col("_new_ts").isNotNull(), F.col("_new_ts")
            ).otherwise(F.col(end_col)),
        )
        .withColumn(
            current_flag,
            F.when(F.col("_new_ts").isNotNull(), F.lit(False)).otherwise(
                F.col(current_flag)
            ),
        )
        .drop("_new_ts")
    )
    new_rows = updates.withColumn(current_flag, F.lit(True)).withColumn(
        end_col, F.lit(None).cast("timestamp")
    )
    return closed.unionByName(new_rows)
