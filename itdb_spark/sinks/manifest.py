"""Side-effecting sinks as manifest DataFrames.

The reference materializes playlists as symlink/copy directory trees plus
m3u files (playlistlinks.py:186-266) and text reports (orphaned_files:
120-137). Side effects don't belong in executors under task retry, so the
engine computes a deterministic *manifest DataFrame* — (src, dest,
link_type, m3u_line, seq) — and a thin driver-side applier performs the
I/O idempotently (SURVEY.md §7.1). The manifest itself is an oracle-
checkable relational result."""

from __future__ import annotations

import os
from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from itdb_spark.functions.core import sanitize_filename


def symlink_manifest(
    tracks: DataFrame,
    path_col: str = "path",
    name_col: str = "name",
    layout: Iterable[str] = ("genre", "artist"),
    start_number: int = 0,
) -> DataFrame:
    """Compute the symlink tree manifest: `%(Genre)s/%(Artist)s/NNN-name`
    layout (playlistlinks.py:191-197, :211-221; README.md:107-109), with the
    sequential numbering that continues across playlists (win-seq). The
    numbering uses the scale-safe ranged pattern (ranged_row_number:
    repartitionByRange + partition-local numbers + boundary offsets), not a
    single-partition global window."""
    from itdb_spark.plans.library import ranged_row_number

    dest_dir = F.concat_ws(
        "/", *[sanitize_filename(F.col(c)) for c in layout]
    )
    order_cols = [F.col(c) for c in layout] + [F.col(path_col)]
    numbered = ranged_row_number(tracks, order_cols, start=start_number, out_col="seq")
    return numbered.select(
        F.col(path_col).alias("src"),
        F.concat(
            dest_dir,
            F.lit("/"),
            F.lpad(F.col("seq").cast("string"), 3, "0"),
            F.lit("-"),
            sanitize_filename(F.col(name_col)),
        ).alias("dest"),
        F.lit("symlink").alias("link_type"),
        F.col("seq"),
    )


def m3u_manifest(
    tracks: DataFrame,
    path_col: Column | str = "path",
    name_col: Column | str = "name",
    desc: str = "",
) -> DataFrame:
    """m3u playlist lines with the reference's `#ITDBDESC`/`#ITDBFILE` header
    comments (templates/filelist.tmpl.m3u:1-4; playlistlinks.py:254-265);
    one ordered line per row. Line numbering via the scale-safe ranged
    pattern — no single-partition global window."""
    from itdb_spark.plans.library import ranged_row_number

    path_c = F.col(path_col) if isinstance(path_col, str) else path_col
    name_c = F.col(name_col) if isinstance(name_col, str) else name_col
    base = tracks.select(path_c.alias("_path"), name_c.alias("_name"))
    numbered = ranged_row_number(base, ["_name", "_path"], out_col="seq")
    return numbered.select(
        "seq",
        F.concat(F.lit("#ITDBFILE:"), F.col("_name"), F.lit("\n"), F.col("_path")).alias("line"),
    )


def apply_manifest(manifest: DataFrame, root: str, dry_run: bool = False) -> list[dict]:
    """Driver-side applier: idempotently create symlinks/copies from a
    (small, already filtered) manifest. Collect is safe — manifests are
    per-playlist sized; for cluster-wide filesystems use foreachPartition."""
    actions = [r.asDict() for r in manifest.collect()]
    if dry_run:
        return actions
    for a in actions:
        dest = os.path.join(root, a["dest"])
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        if os.path.islink(dest) or os.path.exists(dest):
            os.remove(dest)
        os.symlink(a["src"], dest)
    return actions


def write_text_report(df: DataFrame, line_col: str, out_path: str) -> int:
    """Sorted text-file sink (orphaned_files:120-121, :132-137): collect the
    ordered single-column result and write one file driver-side. For big
    outputs use df.write.text (distributed, one file per partition)."""
    lines = [r[0] for r in df.select(line_col).orderBy(line_col).collect()]
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + ("\n" if lines else ""))
    return len(lines)
