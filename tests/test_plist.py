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


def test_fswalk_scan(spark, tmp_path):
    from itdb_spark.sources.fswalk import scan_files

    (tmp_path / "a.bin").write_bytes(b"12345")
    (tmp_path / "b.bin").write_bytes(b"1234567890")
    out = {r.path.rsplit("/", 1)[-1]: r.size for r in scan_files(spark, str(tmp_path)).collect()}
    assert out == {"a.bin": 5, "b.bin": 10}
