"""End-to-end reference pipeline: plist XML → relations → materialized
playlist_stats → report aggregates → HTML + m3u + symlink sinks — the
whole itdbloader.py/itdb2html.py/playlistlinks.py flow as one lazy DAG
(SURVEY.md §3.1 'Spark shape')."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_full_pipeline(spark, tmp_path):
    from itdb_spark.functions.core import decode_location, ms_to_hms
    from itdb_spark.plans import genre_histogram, playlist_quality, playlist_stats, restat
    from itdb_spark.queries.scans import _synth_library
    from itdb_spark.sinks.html import write_cached_page
    from itdb_spark.sinks.manifest import apply_manifest, m3u_manifest, symlink_manifest
    from itdb_spark.sources.plist import read_itunes_library
    from itdb_spark.streaming.events import freshness_gate

    # 1. freshness gate (inc-mtime, itdbloader.py:78-103)
    lib = tmp_path / "library.xml"
    marker = tmp_path / ".loaded"
    _synth_library(str(lib), n_tracks=80, n_playlists=6)
    assert freshness_gate(str(lib), str(marker))

    # 2. ingest: plist → three relations (itdbloader.py:146-223)
    rels = read_itunes_library(spark, str(lib), user_id=1)
    tracks, playlists, pt = rels["tracks"], rels["playlists"], rels["playlist_tracks"]
    assert tracks.count() == 80
    assert playlists.count() == 6
    assert pt.count() > 0

    # 3. materialize playlist_stats in ONE shuffle (vs N+1, itdbloader.py:260-293)
    stats = playlist_stats(tracks, pt).cache()
    assert stats.where((F.col("Rating") < 0) | (F.col("Rating") > 100)).count() == 0
    # histogram total ≡ junction join cardinality
    joined = pt.join(tracks.select("User_ID", "Track_ID"), ["User_ID", "Track_ID"]).count()
    assert stats.agg(F.sum("Count")).collect()[0][0] == joined

    # 4. report aggregates (itdb2html.py): re-agg, genre histogram, quality
    assert restat(stats).count() > 0
    hist = genre_histogram(tracks, user_id=1, thing="Genre")
    assert hist.agg(F.sum("Count")).collect()[0][0] == tracks.count()
    quality = playlist_quality(stats)
    assert quality.where((F.col("Quality") < 0) | (F.col("Quality") > 5)).count() == 0

    # 5. HTML sink with cache semantics (itdb2html.py:343-365)
    page, hit = write_cached_page(hist, "Genres", str(tmp_path / "genres.html"))
    assert not hit and os.path.getsize(page) > 0

    # 6. playlist export: decoded locations → m3u + symlink tree
    #    (playlistlinks.py:186-266)
    export = (
        pt.where(F.col("Playlist_ID") == 1)
        .join(tracks, ["User_ID", "Track_ID"])
        .select(
            decode_location(F.col("Location")).alias("path"),
            F.col("Name").alias("name"),
            F.coalesce(F.col("Genre"), F.lit("")).alias("genre"),
            ms_to_hms(F.col("Total_Time")).alias("duration"),
        )
    )
    m3u = m3u_manifest(export, "path", "name")
    lines = [r.line for r in m3u.orderBy("seq").collect()]
    assert lines and all(l.startswith("#ITDBFILE:") for l in lines)
    assert "%20" not in lines[0]  # locations decoded

    for t in export.select("duration").take(5):
        assert ":" in t.duration

    # symlink manifest applied to a real tree (targets need not exist for symlinks)
    manifest = symlink_manifest(export, "path", "name", layout=("genre",))
    actions = apply_manifest(manifest, str(tmp_path / "links"))
    assert len(actions) == export.count()
    assert all(os.path.islink(os.path.join(tmp_path / "links", a["dest"])) for a in actions)

    # 7. commit freshness marker → second run gated off
    marker.write_text("")
    os.utime(str(marker))
    assert not freshness_gate(str(lib), str(marker))
