"""SparkSession factory tuned for this engine.

Local mode for tests/bench; the same settings are what we would ship on a
real cluster (AQE with skew-join handling, UTC session TZ so results are
oracle-comparable, Arrow for the few pandas-UDF paths).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "itdb_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a tuned SparkSession.

    Scale notes: on a real cluster only ``master`` and the memory settings
    change; AQE re-plans shuffle partition counts at runtime so the static
    ``spark.sql.shuffle.partitions`` is just the pre-AQE upper bound.
    """
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(n, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # PySpark 4's DataFrame debugging captures a Python call site and
        # ships it over py4j on EVERY DataFrame method call (~3 extra RPC
        # round-trips each) purely to enrich error messages. Off, query
        # CONSTRUCTION — which the bench times as part of each query
        # callable — drops ~2× (dedup-minhash 0.65→0.31 s construct,
        # cProfile: py4j socket reads were 80% of construction; measured
        # r14). Plans, results, and scale behavior are identical; this is
        # driver-side constant overhead on any cluster, not a local-mode
        # tune.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
