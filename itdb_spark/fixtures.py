"""Deterministic itdb-domain fixtures (FIXTURES.md): synthetic
tracks / playlists / playlist_tracks / ffprobe_streams / files tables with
the reference's quirks — null ratings, ''-vs-NULL strings, URL-encoded
locations, playlist folder hierarchy, fingerprint dupe groups. Seed=42.

These exercise operator semantics the driver star schema can't (FIXTURES.md
§edge-case checklist); the DuckDB-oracle corpus runs on the star schema.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession

from itdb_spark.catalog import (
    FFPROBE_STREAMS_SCHEMA,
    FILES_SCHEMA,
    PLAYLIST_TRACKS_SCHEMA,
    PLAYLISTS_SCHEMA,
    TRACKS_SCHEMA,
)

GENRES = ["Rock", "Jazz", "Pop", "Classical", "Hip-Hop", None]
KINDS = ["MPEG audio file", "Purchased AAC audio file", "MPEG-4 video file"]


def make_tracks(spark: SparkSession, n: int = 200) -> DataFrame:
    rng = random.Random(42)
    rows = []
    for i in range(1, n + 1):
        user = 1 if i % 10 else 2  # ~90% user 1 (multi-tenant, itdb.sql:6-7)
        rating = None if rng.random() < 0.4 else rng.choice([0, 20, 40, 60, 80, 100])
        artist = rng.choice([f"Artist {i % 17}", None, ""])  # NULL and '' distinct
        name = f"TRACK {i}" if i % 13 == 0 else f"Track ésprit {i}" if i % 29 == 0 else f"Track {i}"
        loc = (
            f"file://localhost/Volumes/Data/Music/Artist%20{i % 17}/{i:02d}%20Track{i}.mp3"
            if i % 31
            else f"file://localhost/Volumes/Data/Music/A&amp;B/{i}.mp3"
        )
        rows.append(
            {
                "User_ID": user,
                "Track_ID": i,
                "Name": name,
                "Artist": artist,
                "Album_Artist": artist,
                "Composer": None,
                "Album": f"Album {i % 23}" if i % 7 else "",
                "Genre": GENRES[i % len(GENRES)],
                "Kind": KINDS[i % len(KINDS)],
                "Size": 1_000_000 + i * 31337,
                "Total_Time": 30_000 + (i * 7919) % 7_200_000,
                "Track_Number": i % 15 or None,
                "Track_Count": 15,
                "Disc_Number": 1,
                "Disc_Count": 1,
                "Year": 1960 + i % 66 if i % 33 else None,
                "Rating": rating,
                "Album_Rating": rating,
                "Play_Count": (i * 13) % 50,
                "Skip_Count": i % 5,
                "Compilation": i % 11 == 0,
                "Loved": i % 9 == 0,
                "Explicit": False,
                "TV_Show": i % 20 == 0,
                "Movie": i % 25 == 0,
                "Date_Added": datetime(2019, 1, 1) + timedelta(days=i % 900),
                "Date_Modified": datetime(2020, 1, 1) + timedelta(days=i % 900),
                "Play_Date_UTC": None if i % 6 == 0 else datetime(2023, 1, 1) + timedelta(hours=i),
                "Skip_Date": None,  # zero-date sentinel → null (itdb.sql:9)
                "Release_Date": None if i % 12 == 0 else datetime(2000 + i % 24, 1, 1),
                "Persistent_ID": f"{i:016X}",
                "Track_Type": "File",
                "Location": loc,
            }
        )
    return spark.createDataFrame(
        [[r[f.name] for f in TRACKS_SCHEMA.fields] for r in rows], TRACKS_SCHEMA
    )


def make_playlists(spark: SparkSession, n: int = 30) -> DataFrame:
    """3-level folder tree: folders 1-5 are roots, 6-12 children of roots,
    rest playlists under either (some grandchildren); one empty playlist."""
    rows = []
    for p in range(1, n + 1):
        if p <= 5:
            parent = None
        elif p <= 12:
            parent = f"P{(p % 5) + 1:015X}"
        else:
            parent = f"P{6 + (p % 7):015X}"
        rows.append((1, p, f"Playlist {p}" if p % 4 else f"Best of {p}", f"P{p:015X}", parent))
    return spark.createDataFrame(rows, PLAYLISTS_SCHEMA)


def make_playlist_tracks(
    spark: SparkSession, n_tracks: int = 200, n_playlists: int = 30
) -> DataFrame:
    """Skewed membership: playlist 13 = "Library" (all tracks), most others
    10-50 tracks, playlist 30 empty; includes duplicated (pl, track) feed
    rows and a dangling Track_ID (FIXTURES.md)."""
    rows = []
    for t in range(1, n_tracks + 1):
        rows.append((1, 13, t))
    for p in range(14, 30):
        for t in range(1, n_tracks + 1):
            if (t * p) % 11 == 0:
                rows.append((1, p, t))
    rows.append((1, 14, 11))  # duplicate of a (p,t) pair → LOAD IGNORE path
    rows.append((1, 15, 99999))  # dangling FK (restore_playlist.py:136)
    return spark.createDataFrame(rows, PLAYLIST_TRACKS_SCHEMA)


def make_ffprobe_streams(spark: SparkSession, tracks: DataFrame) -> DataFrame:
    """JSON stream rows for ~60% of TV/Movie tracks (the other 40% feed the
    incremental anti-join, itdbmetadata.py:127-133)."""
    av = [
        r.Persistent_ID
        for r in tracks.where("TV_Show OR Movie").select("Persistent_ID").collect()
    ]
    rows = []
    for idx, pid in enumerate(sorted(av)):
        if idx % 5 >= 3:
            continue  # leave 40% unprobed
        h = [480, 720, 1080][idx % 3]
        rows.append((pid, 0, f'{{"index":0,"codec_type":"video","height":{h},"width":{h*16//9}}}'))
        rows.append((pid, 1, '{"index":1,"codec_type":"audio","channels":2}'))
    return spark.createDataFrame(rows, FFPROBE_STREAMS_SCHEMA)


def make_files(spark: SparkSession, tracks: DataFrame) -> DataFrame:
    """Filesystem-scan table: ~90% decoded track locations (some case-
    mangled), orphans, excluded prefixes, checksum dupe groups."""
    locs = [
        (r.Track_ID, r.Location, r.Size)
        for r in tracks.select("Track_ID", "Location", "Size").collect()
    ]
    rows = []
    for tid, loc, size in locs:
        if tid % 12 == 0:
            continue  # missing from disk → library−fs
        path = (
            loc.replace("file://localhost", "").replace("%20", " ").replace("&amp;", "&")
        )
        if tid % 17 == 0:
            path = path.upper()  # case-normalization test
        checksum = None if size <= 100_000 else f"ck{(tid % 40):04d}"  # dup groups
        rows.append((path, size, datetime(2024, 1, 1) + timedelta(days=tid % 30), checksum))
    for i in range(10):  # orphans on disk, not in library
        rows.append((f"/Volumes/Data/Music/Orphans/orphan{i}.mp3", 5_000_000, datetime(2024, 2, 1), None))
    rows.append(("/Volumes/Data/Music/.DS_Store", 10, datetime(2024, 2, 1), None))
    rows.append(("/Volumes/Data/tones/ring.m4r", 10, datetime(2024, 2, 1), None))
    return spark.createDataFrame(rows, FILES_SCHEMA)
