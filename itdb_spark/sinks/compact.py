"""Small-files compaction — the table-maintenance operator every
long-running ingest needs at scale: streaming/incremental writers emit
one file per trigger per partition, and a 100 TB table accumulates
millions of KB-sized parquet files whose per-file open/footer cost
dominates scans (the classic small-files problem; Iceberg/Delta ship
`rewrite_data_files`/`OPTIMIZE` for exactly this). This is the plain-
parquet form: size-aware rewrite into right-sized files.

Sizing is by MEASURED bytes, not row counts: the target file count is
ceil(total_compressed_bytes / target_bytes), never fewer than 1, and
the rewrite uses a round-robin repartition (no key skew — compaction
must not inherit data skew; layout-preserving compaction would
repartitionByRange on the sort key instead, noted for callers). The
rewrite stages into a sibling directory and atomically renames over
the source only after the row-count parity check passes — a failed
compaction leaves the table untouched.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def parquet_file_stats(path: str) -> tuple[int, int]:
    """(n_files, total_bytes) over the directory's parquet parts."""
    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    return len(files), sum(os.path.getsize(f) for f in files)


def compact_parquet(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Rewrite the parquet directory at ``path`` into
    ceil(total_bytes / target_bytes) files. Returns a stats dict
    {files_before, bytes_before, files_after, rows}. Refuses to swap in
    the rewrite unless row counts match exactly."""
    files_before, bytes_before = parquet_file_stats(path)
    n_out = max(1, math.ceil(bytes_before / target_bytes))
    src = spark.read.parquet(path)
    rows_before = src.count()
    staging = path.rstrip("/") + ".__compact__"
    src.repartition(n_out).write.mode("overwrite").parquet(staging)
    rows_after = spark.read.parquet(staging).count()
    if rows_after != rows_before:
        shutil.rmtree(staging)
        raise RuntimeError(
            f"compaction row mismatch: {rows_before} -> {rows_after}"
        )
    backup = path.rstrip("/") + ".__old__"
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    files_after, _ = parquet_file_stats(path)
    return {
        "files_before": files_before,
        "bytes_before": bytes_before,
        "files_after": files_after,
        "rows": rows_before,
    }
