from itdb_spark.plans.library import (  # noqa: F401
    adjacent_dupes,
    adjacent_dupes_scalable,
    checksum_dupes,
    genre_histogram,
    materialized,
    orphans_and_missing,
    playlist_quality,
    playlist_stats,
    restat,
    unprobed_av_tracks,
    videos_below,
)
