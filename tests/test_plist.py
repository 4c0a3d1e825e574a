"""plist ingest tests: the binaryFile+plistlib source (SURVEY.md §1.1,
itdbloader.py:306-310) against a synthesized library."""

from __future__ import annotations

import plistlib
from datetime import datetime

import pytest


@pytest.fixture(scope="module")
def library_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("lib")
    path = d / "iTunes Library.xml"
    tracks = {
        "1": {
            "Track ID": 1,
            "Name": "Alpha",
            "Artist": "A",
            "Genre": "Rock",
            "Rating": 100,
            "Total Time": 123000,
            "Persistent ID": "0000000000000001",
            "Date Added": datetime(2021, 5, 1),
            "Unknown Future Field": "surprise",
        },
        "2": {"Track ID": 2, "Name": "Beta", "Artist": "B", "Genre": "Jazz"},
        "3": {"Track ID": 3, "Name": "Gamma"},
    }
    playlists = [
        {
            "Playlist ID": 10,
            "Name": "Mixed",
            "Playlist Persistent ID": "P1",
            "Playlist Items": [{"Track ID": 1}, {"Track ID": 2}, {"Track ID": 2}],
        },
        {"Playlist ID": 11, "Name": "Empty", "Playlist Persistent ID": "P2",
         "Parent Persistent ID": "P1"},
    ]
    with open(path, "wb") as fh:
        plistlib.dump({"Tracks": tracks, "Playlists": playlists}, fh)
    return str(path)


def test_read_itunes_library(spark, library_path):
    from itdb_spark.sources.plist import read_itunes_library

    rels = read_itunes_library(spark, library_path, user_id=7)
    tracks = {r.Track_ID: r for r in rels["tracks"].collect()}
    assert set(tracks) == {1, 2, 3}
    assert tracks[1].Name == "Alpha"
    assert tracks[1].Rating == 100
    assert tracks[1].User_ID == 7
    assert tracks[1].Date_Added == datetime(2021, 5, 1)
    assert tracks[3].Genre is None  # absent key → null

    pls = {r.Playlist_ID: r for r in rels["playlists"].collect()}
    assert pls[11].Parent_Persistent_ID == "P1"

    # junction explode + LOAD IGNORE dedup (itdbloader.py:215-220, :229-231)
    pt = rels["playlist_tracks"].collect()
    assert sorted((r.Playlist_ID, r.Track_ID) for r in pt) == [(10, 1), (10, 2)]


def test_discover_unknown_keys(spark, library_path):
    from itdb_spark.sources.plist import discover_unknown_keys

    missing = {r.key for r in discover_unknown_keys(spark, library_path).collect()}
    assert "Unknown_Future_Field" in missing
    assert "Name" not in missing


@pytest.fixture(scope="module")
def big_library_path(tmp_path_factory):
    """A library big enough to span many chunks at a small chunk size, with
    hostile-looking string values (XML-escaped angle brackets / fake markers)
    that must NOT confuse the range splitter."""
    d = tmp_path_factory.mktemp("biglib")
    path = d / "library.xml"
    tracks = {
        str(i): {
            "Track ID": i,
            "Name": f"Track <key> & </dict> {i}" if i % 7 == 0 else f"Track {i}",
            "Artist": f"Artist {i % 13}",
            "Genre": ["Rock", "Jazz", "Pop"][i % 3],
            "Rating": (i % 6) * 20,
            "Total Time": 100000 + i,
            "Persistent ID": f"{i:016X}",
            "Date Added": datetime(2020, 1, 1 + i % 28),
        }
        for i in range(1, 401)
    }
    with open(path, "wb") as fh:
        plistlib.dump({"Tracks": tracks, "Playlists": []}, fh)
    return str(path)


def test_chunked_tracks_equals_whole_parse(spark, big_library_path):
    """The >memory split-parallel parse (read_itunes_tracks_chunked) yields
    exactly the whole-file plistlib parse, for chunk sizes that slice
    records mid-entry (4 KB ≪ file size → dozens of ranges)."""
    import os

    from itdb_spark.sources.plist import (
        read_itunes_library,
        read_itunes_tracks_chunked,
    )

    assert os.path.getsize(big_library_path) > 16 * 4096  # really multi-chunk
    whole = sorted(map(tuple, read_itunes_library(spark, big_library_path, 3)["tracks"].collect()))
    chunked = sorted(
        map(tuple, read_itunes_tracks_chunked(spark, big_library_path, 3, chunk_bytes=4096).collect())
    )
    assert len(whole) == 400
    assert chunked == whole


def test_chunked_tracks_single_chunk_degenerate(spark, library_path):
    """chunk_bytes larger than the file → one range, same result."""
    from itdb_spark.sources.plist import (
        read_itunes_library,
        read_itunes_tracks_chunked,
    )

    whole = sorted(map(tuple, read_itunes_library(spark, library_path, 7)["tracks"].collect()))
    chunked = sorted(
        map(tuple, read_itunes_tracks_chunked(spark, library_path, 7).collect())
    )
    assert chunked == whole


def test_plist_datasource_format(spark, big_library_path):
    """spark.read.format('itunes_plist') — the Spark 4 Python DataSource
    front end — returns exactly the whole-file parse, scheduling one task
    per byte range."""
    from itdb_spark.sources.plist import read_itunes_library
    from itdb_spark.sources.plist_datasource import PlistDataSource

    spark.dataSource.register(PlistDataSource)
    via_ds = (
        spark.read.format("itunes_plist")
        .option("chunk_bytes", 8192)
        .option("user_id", 3)
        .load(big_library_path)
    )
    assert via_ds.schema == read_itunes_library(spark, big_library_path, 3)["tracks"].schema
    whole = sorted(map(tuple, read_itunes_library(spark, big_library_path, 3)["tracks"].collect()))
    got = sorted(map(tuple, via_ds.collect()))
    assert got == whole
    assert via_ds.rdd.getNumPartitions() > 4  # really split-scheduled


def test_fswalk_scan(spark, tmp_path):
    from itdb_spark.sources.fswalk import scan_files

    (tmp_path / "a.bin").write_bytes(b"12345")
    (tmp_path / "b.bin").write_bytes(b"1234567890")
    out = {r.path.rsplit("/", 1)[-1]: r.size for r in scan_files(spark, str(tmp_path)).collect()}
    assert out == {"a.bin": 5, "b.bin": 10}
