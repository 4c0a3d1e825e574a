from itdb_spark.streaming.events import (  # noqa: F401
    run_available_now,
    windowed_counts_stream,
)
