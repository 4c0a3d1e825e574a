"""Recursive filesystem scan as a DataFrame source.

The reference os.walks volumes into (location, mtime, size) dicts
(dupes/dedup.py:101-113; orphaned_files:63); Spark's ``binaryFile`` source
gives (path, modificationTime, length) distributed, with partition-parallel
listing — at 100 TB the file listing itself is the job, and binaryFile
parallelizes it."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scan_files(spark: SparkSession, root: str, glob: str | None = None) -> DataFrame:
    """(path, size, mtime) scan; content column dropped so the scan never
    reads file bodies (pushed projection)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(root)
    return df.select(
        F.col("path"),
        F.col("length").alias("size"),
        F.col("modificationTime").alias("mtime"),
    )


def normalize_path(col):
    """Case-insensitive compare normalization (orphaned_files:72-84):
    lowercase + strip file: scheme."""
    return F.lower(F.regexp_replace(col, r"^file:/+(localhost)?", "/"))
