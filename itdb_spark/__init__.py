"""itdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference iTunes-library ETL/reporting
toolchain (arkarkark/itdb), re-expressed Spark-first.

Layout:
  session    — tuned SparkSession factory (AQE, shuffle partitions, Arrow)
  catalog    — testdata table loader / temp-view registration / schemas
  functions/ — column-expression helpers (stars, portable hash, text metrics)
  operators/ — composed DataFrame operators (hierarchy, topk, dedup, knn, ...)
  sources/   — plist ingest, filesystem scan
  sinks/     — manifest-DataFrame sinks (m3u, symlink tree, text, HTML)
  streaming/ — Structured Streaming wrappers over the events table
  queries/   — the oracle-checked query registry backing __spark_entry__
"""

__version__ = "0.1.0"
