"""A Spark 4 Python DataSource for iTunes library plists:

    spark.dataSource.register(PlistDataSource)
    spark.read.format("itunes_plist") \\
         .option("chunk_bytes", 4096).option("user_id", 7).load(path)

SURVEY.md §4 names this as the one worthwhile engine extension point
("a Python DataSource (Spark 4 API) for plist if we want
spark.read.format('plist') ergonomics — otherwise mapPartitions
suffices"); this is that ergonomic front end over the same split-parallel
range scanner the chunked ingest uses (sources/plist.py:
_scan_track_range — Hadoop-split record protocol, task memory bounded by
chunk_bytes). Input partitions ARE the byte ranges, so Spark schedules
one task per range and a >memory library parses across the cluster with
no driver pass over the file.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from itdb_spark.catalog import TRACKS_SCHEMA

DEFAULT_CHUNK_BYTES = 64 << 20


class _ByteRange(InputPartition):
    def __init__(self, path: str, start: int, end: int, user_id: int):
        self.path = path
        self.start = start
        self.end = end
        self.user_id = user_id


class PlistDataSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("itunes_plist: .load(path) is required")
        self.chunk_bytes = int(options.get("chunk_bytes", DEFAULT_CHUNK_BYTES))
        self.user_id = int(options.get("user_id", 1))

    def partitions(self) -> Sequence[InputPartition]:
        size = os.path.getsize(self.path)
        n = max(1, -(-size // self.chunk_bytes))
        return [
            _ByteRange(
                self.path,
                i * self.chunk_bytes,
                min(size, (i + 1) * self.chunk_bytes),
                self.user_id,
            )
            for i in range(n)
        ]

    def read(self, partition: _ByteRange) -> Iterator[tuple]:
        # imported inside the task: the scanner is the same record-split
        # parser the chunked batch path uses
        from itdb_spark.sources.plist import _scan_track_range

        yield from _scan_track_range(
            partition.path, partition.start, partition.end, partition.user_id
        )


class PlistDataSource(DataSource):
    """``format("itunes_plist")`` — tracks relation from one library XML."""

    @classmethod
    def name(cls) -> str:
        return "itunes_plist"

    def schema(self):
        return TRACKS_SCHEMA

    def reader(self, schema) -> PlistDataSourceReader:
        return PlistDataSourceReader(self.options)
