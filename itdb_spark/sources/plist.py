"""Apple plist (iTunes Library XML) ingest.

The reference parses the whole library with ``plistlib.load`` into a nested
dict (itdbloader.py:306-310) and writes tracks / playlists /
playlist_tracks relations from it (itdbloader.py:146-223). plist XML cannot
be modelled by spark-xml (``<key>``/value sibling pairs, SURVEY.md §1.1), so
ingest is: ``binaryFile`` scan → ``plistlib`` inside ``mapPartitions``-style
UDF code → rows against the explicit StructType catalog.

One library file is one plist document; parallelism at scale comes from many
libraries (the reference is explicitly multi-tenant via User_ID,
itdb.sql:6-7), so ``binaryFile`` over a directory of libraries distributes
naturally — one task per library file.
"""

from __future__ import annotations

import plistlib
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from itdb_spark.catalog import PLAYLISTS_SCHEMA, PLAYLIST_TRACKS_SCHEMA, TRACKS_SCHEMA

# plist keys use spaces; the relational layer renames spaces→underscores
# (itdbloader.py:166-168, :203).
_TRACK_FIELDS = {f.name: f for f in TRACKS_SCHEMA.fields if f.name not in ("User_ID",)}


def _coerce(value: Any, spark_type_name: str) -> Any:
    if value is None:
        return None
    if spark_type_name in ("integer", "long"):
        return int(value)
    if spark_type_name == "boolean":
        return bool(value)
    if spark_type_name == "string":
        return str(value)
    if spark_type_name == "timestamp":
        return value  # plistlib yields datetime already
    return value


def _project_track(track: dict, user_id: int) -> tuple:
    """Project one track dict onto the schema (schema-driven projection,
    itdbloader.py:165-168), unknown keys tolerated."""
    row = {"User_ID": user_id}
    for key, value in track.items():
        col = key.replace(" ", "_")
        field = _TRACK_FIELDS.get(col)
        if field is not None:
            row[col] = _coerce(value, field.dataType.typeName())
    return tuple(row.get(f.name) for f in TRACKS_SCHEMA.fields)


def _track_rows(itunes: dict, user_id: int) -> Iterator[tuple]:
    """itunes["Tracks"] is a map str(track_id) → dict of ~70 fields
    (itdbloader.py:148-156)."""
    for _tid, track in itunes.get("Tracks", {}).items():
        yield _project_track(track, user_id)


def _playlist_rows(itunes: dict, user_id: int) -> Iterator[tuple]:
    for pl in itunes.get("Playlists", []):
        yield (
            user_id,
            int(pl.get("Playlist ID", 0)),
            pl.get("Name"),
            pl.get("Playlist Persistent ID"),
            pl.get("Parent Persistent ID"),
        )


def _playlist_track_rows(itunes: dict, user_id: int) -> Iterator[tuple]:
    """Explode the nested "Playlist Items" array into the junction relation —
    the reference materializes exactly this explode (itdbloader.py:215-220)."""
    for pl in itunes.get("Playlists", []):
        pid = int(pl.get("Playlist ID", 0))
        for item in pl.get("Playlist Items", []) or []:
            yield (user_id, pid, int(item["Track ID"]))


def read_itunes_library(
    spark: SparkSession, path: str, user_id: int = 1
) -> dict[str, DataFrame]:
    """Read one-or-many iTunes library plists under ``path`` →
    {"tracks", "playlists", "playlist_tracks"} DataFrames.

    Uses a binaryFile scan so each library parses inside an executor task;
    the plist → rows flattening happens distributed, not on the driver.
    """
    raw = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse_partition(rows):
        import io

        for r in rows:
            itunes = plistlib.load(io.BytesIO(r.content))
            yield r.path, itunes

    # Each library is independent; collectless distributed flatten via RDD
    # mapPartitions (the one justified RDD use: per-file imperative parse).
    # Cached because three relations derive from one parse. Lifecycle: an
    # RDD cache (unlike a CacheManager plan cache) is reclaimed by Spark's
    # ContextCleaner as soon as the three returned DataFrames are
    # garbage-collected driver-side — no unpersist hook needed, and none
    # is possible while the frames are live.
    parsed = raw.rdd.mapPartitions(parse_partition).cache()

    tracks = spark.createDataFrame(
        parsed.flatMap(lambda pr: _track_rows(pr[1], user_id)), TRACKS_SCHEMA
    )
    playlists = spark.createDataFrame(
        parsed.flatMap(lambda pr: _playlist_rows(pr[1], user_id)), PLAYLISTS_SCHEMA
    )
    playlist_tracks = spark.createDataFrame(
        parsed.flatMap(lambda pr: _playlist_track_rows(pr[1], user_id)),
        PLAYLIST_TRACKS_SCHEMA,
    )
    # LOAD DATA ... IGNORE first-writer-wins PK semantics (itdbloader.py:229-231)
    playlist_tracks = playlist_tracks.dropDuplicates(
        ["User_ID", "Playlist_ID", "Track_ID"]
    )
    return {"tracks": tracks, "playlists": playlists, "playlist_tracks": playlist_tracks}


# --- >memory chunked ingest --------------------------------------------------
#
# A single library XML bigger than executor memory cannot go through
# plistlib.load on the whole file (the reference itself flags the memory
# pressure, README.md:64-68). iTunes library XML is machine-generated and
# rigidly indented: inside <key>Tracks</key><dict>, every track entry is
#
#     \n\t\t<key>TRACK_ID</key>\n\t\t<dict> ... \n\t\t</dict>
#
# with exactly two tabs at track level (field keys are 3+ tabs, playlist
# structures are 1 or 3+ tabs, and plistlib XML-escapes <,>,& in string
# values — so the 2-tab marker cannot occur in data). That makes the file
# splittable exactly like Hadoop's text input format: fixed byte ranges,
# each task claims every record whose *marker offset* falls inside its
# range and reads past its end to finish the last record.

_TRACK_MARKER = b"\n\t\t<key>"
_TRACK_CLOSE = b"\n\t\t</dict>"
_PLIST_WRAP = (
    b'<?xml version="1.0" encoding="UTF-8"?>\n<plist version="1.0">%s</plist>'
)


def _scan_track_range(path: str, start: int, end: int, user_id: int) -> Iterator[tuple]:
    """Parse every track whose entry-marker offset lies in [start, end).

    Memory bound: one read buffer of (range + one overhanging record) —
    never the whole file. Each fragment is wrapped into a one-dict plist
    and parsed with plistlib (full XML unescaping / type coercion)."""
    with open(path, "rb") as fh:
        # back up so a marker straddling the boundary is still found
        seek = max(0, start - len(_TRACK_MARKER) + 1)
        fh.seek(seek)
        buf = fh.read(end - seek)

        def find_extending(token: bytes, from_: int) -> int:
            """buf.find that reads more of the file when the token may be
            truncated at the buffer end (a record overhanging the range)."""
            nonlocal buf
            while True:
                idx = buf.find(token, from_)
                if idx != -1:
                    return idx
                more = fh.read(1 << 20)
                if not more:
                    return -1
                buf += more

        pos = 0
        while True:
            m = buf.find(_TRACK_MARKER, pos)
            if m == -1 or seek + m >= end:
                return
            dict_open = find_extending(b"<dict>", m)
            if dict_open == -1:
                return
            close = find_extending(_TRACK_CLOSE, dict_open)
            if close == -1:
                return
            frag = buf[dict_open : close + len(_TRACK_CLOSE)]
            track = plistlib.loads(_PLIST_WRAP % frag)
            yield _project_track(track, user_id)
            pos = close + len(_TRACK_CLOSE)


def read_itunes_tracks_chunked(
    spark: SparkSession, path: str, user_id: int = 1, chunk_bytes: int = 64 << 20
) -> DataFrame:
    """Tracks relation from ONE (arbitrarily large) library XML, parsed in
    parallel byte ranges — the >memory ingest path. Ranges are claimed by
    marker offset (Hadoop-split protocol), so every track parses exactly
    once regardless of chunk boundaries; equivalence with the whole-file
    parse is a test invariant (tests/test_plist.py). Playlists (a tiny
    section) still go through read_itunes_library.

    The driver never reads the file; executors each read their range plus
    at most one overhanging record. chunk_bytes bounds task memory."""
    import os

    size = os.path.getsize(path)
    n_chunks = max(1, -(-size // chunk_bytes))
    ranges = [
        (i * chunk_bytes, min(size, (i + 1) * chunk_bytes)) for i in range(n_chunks)
    ]
    rows = (
        spark.sparkContext.parallelize(ranges, n_chunks)
        .flatMap(lambda r: _scan_track_range(path, r[0], r[1], user_id))
    )
    return spark.createDataFrame(rows, TRACKS_SCHEMA)


def discover_unknown_keys(spark: SparkSession, path: str) -> DataFrame:
    """Schema-discovery report: source keys with no matching column — the
    reference's `missing` report ("Perhaps you should update your itdb.sql?",
    itdbloader.py:173-178, :239-247)."""
    raw = spark.read.format("binaryFile").load(path).select("content")

    def keys_partition(rows):
        import io

        for r in rows:
            itunes = plistlib.load(io.BytesIO(r.content))
            for track in itunes.get("Tracks", {}).values():
                for key in track:
                    yield (key.replace(" ", "_"),)

    keys = spark.createDataFrame(raw.rdd.mapPartitions(keys_partition), "key string")
    known = set(TRACKS_SCHEMA.fieldNames())
    return (
        keys.groupBy("key")
        .agg(F.count("*").alias("occurrences"))
        .where(~F.col("key").isin(*known))
        .orderBy("key")
    )
