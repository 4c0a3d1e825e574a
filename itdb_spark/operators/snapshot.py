"""Snapshot diff — change-data-capture between two table versions.

The reference reconciles state by set differences and per-row mtime
comparisons (orphaned_files:101-120; dupes/dedup.py:115-131 "recompute
only changed"); generalized here to the snapshot-diff a training-data
pipeline runs between corpus versions: classify every primary key as
added / removed / changed / unchanged in ONE full-outer join.

Scale: one shuffle on the PK for each side (or zero with PK-bucketed
storage — the same layout MERGE wants, operators/merge.py); the compare
is a null-safe struct equality (IS NOT DISTINCT FROM, field-wise) that
runs JVM-side, so arbitrarily wide compare lists stay in codegen — and,
unlike a delimiter-concat fingerprint, cannot alias across column
boundaries when values contain the delimiter bytes. Downstream
incremental recompute reads only `change != 'unchanged'` — at 100 TB
that filter is the difference between a daily delta job and a full
rebuild.
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
    shared non-PK columns. The compare is struct equality under eqNullSafe
    (SQL IS NOT DISTINCT FROM): exact per-column, null == null, and immune
    to the cross-column aliasing a delimiter-joined string fingerprint
    suffers when values contain the delimiter bytes."""
    if compare_cols is None:
        shared = set(old.columns) & set(new.columns)
        compare_cols = sorted(shared - set(pk))

    def packed() -> F.Column:
        if not compare_cols:
            return F.lit(0)
        return F.struct(*[F.col(c) for c in compare_cols])

    # presence flags distinguish "missing side" from "all-null values"
    o = old.select(*pk, packed().alias("_oval"), F.lit(True).alias("_in_old"))
    n = new.select(*pk, packed().alias("_nval"), F.lit(True).alias("_in_new"))
    joined = o.join(n, pk, "full_outer")
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(~F.col("_oval").eqNullSafe(F.col("_nval")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(*pk, change.alias("change"))
    if not include_unchanged:
        out = out.where(F.col("change") != "unchanged")
    return out
