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

from pyspark.sql import DataFrame, Window
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


def scd2_history(
    log: DataFrame,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a change log: per
    ``key``, collapse consecutive runs of equal ``attr`` (ordered by
    ``ts`` with ``tiebreak`` completing the total order) into validity
    intervals — (key, version, attr, valid_from, valid_to, is_current),
    valid_to exclusive and NULL on the open current row. The warehouse
    counterpart of snapshot_diff: diff classifies WHAT changed between
    two versions, SCD2 materializes WHEN every value held.

    Scale shape: two window families, both partitioned by the dimension
    key (parallel across keys, no global window): lag to mark run heads
    (null-safe — a NULL attr is its own run, not a perpetual change),
    then lead + row_number over the heads only, a frame already
    collapsed to one row per run. Rows with NULL ``ts`` are excluded —
    an unordered change is meaningless and NULL ordering differs across
    engines (Spark NULLS FIRST asc vs DuckDB NULLS LAST)."""
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    marked = (
        log.where(F.col(ts).isNotNull())
        .select(key, ts, tiebreak, attr,
                F.lag(attr).over(w).alias("_prev"),
                F.lag(F.lit(1)).over(w).alias("_has_prev"))
    )
    heads = marked.where(
        F.col("_has_prev").isNull()
        | ~F.col(attr).eqNullSafe(F.col("_prev"))
    )
    w2 = Window.partitionBy(key).orderBy(ts, tiebreak)
    return heads.select(
        key,
        F.row_number().over(w2).alias("version"),
        attr,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w2).alias("valid_to"),
        F.when(F.lead(ts).over(w2).isNull(), 1).otherwise(0).alias("is_current"),
    )
