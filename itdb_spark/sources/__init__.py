from itdb_spark.sources.fswalk import scan_files  # noqa: F401
from itdb_spark.sources.plist import read_itunes_library  # noqa: F401
