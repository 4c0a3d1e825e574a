"""Hierarchy expansion: the reference's playlist folder tree
(`Parent_Persistent_ID` → `Playlist_Persistent_ID`, itdb.sql:92-93) is
traversed one level at playlistlinks.py:153-162; here it's an iterative
self-join loop to a depth cap — each iteration is one broadcast-able join,
no GraphFrames needed (SURVEY.md §1.5)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expand_hierarchy(
    nodes: DataFrame,
    id_col: str,
    parent_col: str,
    max_depth: int = 10,
) -> DataFrame:
    """All (ancestor, descendant, depth) pairs up to ``max_depth``.

    Loop of joins rather than recursion: level N+1 = level N ⋈ edges.
    Each level is checkpoint-free and lazily unioned; the loop stops early
    when a level is empty (fixpoint). At scale, `nodes` is the small
    playlist dimension — every join broadcasts.
    """
    edges = nodes.select(
        F.col(parent_col).alias("ancestor"), F.col(id_col).alias("descendant")
    ).where(F.col(parent_col).isNotNull())

    level = edges.withColumn("depth", F.lit(1))
    out = level
    for _ in range(1, max_depth):
        level = (
            level.alias("l")
            .join(edges.alias("e"), F.col("l.descendant") == F.col("e.ancestor"))
            .select(
                F.col("l.ancestor").alias("ancestor"),
                F.col("e.descendant").alias("descendant"),
                (F.col("l.depth") + 1).alias("depth"),
            )
        )
        if level.isEmpty():
            break
        out = out.unionByName(level)
    return out
