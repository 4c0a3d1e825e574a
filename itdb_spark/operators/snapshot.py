"""Snapshot diff — change-data-capture between two table versions.

The reference reconciles state by set differences and per-row mtime
comparisons (orphaned_files:101-120; dupes/dedup.py:115-131 "recompute
only changed"); generalized here to the snapshot-diff a training-data
pipeline runs between corpus versions: classify every primary key as
added / removed / changed / unchanged in ONE full-outer join.

Scale: one shuffle on the PK for each side (or zero with PK-bucketed
storage — the same layout MERGE wants, operators/merge.py); the compare
runs JVM-side on a concatenated null-tagged projection, so arbitrarily
wide compare lists stay in codegen. Downstream incremental recompute
reads only `change != 'unchanged'` — at 100 TB that filter is the
difference between a daily delta job and a full rebuild.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    pk: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """(pk..., change) for every key in either snapshot; change ∈
    {added, removed, changed, unchanged}. ``compare_cols`` defaults to all
    shared non-PK columns. Null-safe compare (null == null) via a tagged
    concat, mirroring SQL's IS NOT DISTINCT FROM."""
    if compare_cols is None:
        shared = set(old.columns) & set(new.columns)
        compare_cols = sorted(shared - set(pk))

    def tagged(side: DataFrame) -> F.Column:
        # one null-safe fingerprint per row; the \x01/\x00 tags keep
        # (null, "x") distinct from ("x", null) and "" distinct from null
        parts = [
            F.when(F.col(c).isNull(), F.lit("\x00")).otherwise(
                F.concat(F.lit("\x01"), F.col(c).cast("string"))
            )
            for c in compare_cols
        ]
        return F.concat_ws("\x02", *parts) if parts else F.lit("")

    o = old.select(*pk, tagged(old).alias("_ofp"))
    n = new.select(*pk, tagged(new).alias("_nfp"))
    joined = o.join(n, pk, "full_outer")
    change = (
        F.when(F.col("_ofp").isNull(), F.lit("added"))
        .when(F.col("_nfp").isNull(), F.lit("removed"))
        .when(F.col("_ofp") != F.col("_nfp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(*pk, change.alias("change"))
    if not include_unchanged:
        out = out.where(F.col("change") != "unchanged")
    return out
