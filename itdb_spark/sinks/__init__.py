from itdb_spark.sinks.manifest import (  # noqa: F401
    apply_manifest,
    m3u_manifest,
    symlink_manifest,
)
