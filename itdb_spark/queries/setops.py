"""Set operations — SURVEY.md §2.7."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from itdb_spark.catalog import Tables
from itdb_spark.queries import register


@register(
    "set-except",
    oracle="""
    SELECT c_custkey AS key FROM customer
    EXCEPT
    SELECT o_custkey AS key FROM orders
    """,
    doc="A − B set difference (orphans/missing, orphaned_files:101-120) via "
    "EXCEPT; the anti-join twin is join-setdiff.",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.customer.select(F.col("c_custkey").alias("key")).exceptAll(
        t.orders.select(F.col("o_custkey").alias("key"))
    ).distinct()


@register(
    "set-union",
    oracle="""
    SELECT 'region' AS src, r_name AS name FROM region
    UNION ALL
    SELECT 'nation' AS src, n_name AS name FROM nation
    """,
    doc="Concatenated multi-source scan into one relation "
    "(dupes/dedup.py:180-181) → unionByName.",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    a = t.region.select(F.lit("region").alias("src"), F.col("r_name").alias("name"))
    b = t.nation.select(F.lit("nation").alias("src"), F.col("n_name").alias("name"))
    return a.unionByName(b)


@register(
    "set-dedup",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS linenumber, min(l_quantity) AS qty
    FROM (
      SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    ) GROUP BY 1, 2
    """,
    doc="PK-level duplicate drop on load: `LOAD DATA ... IGNORE` keeps one "
    "row per PK (first-writer-wins, itdbloader.py:229-231). `dropDuplicates"
    "(PK)` keeps an arbitrary row — fine for idempotent reload but not "
    "oracle-comparable — so the engine's canonical form is a deterministic "
    "tie-break (min) per PK; the testdata lineitem does carry PK dups.",
)
def set_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    feed = t.lineitem.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.col("l_quantity").alias("qty"),
    )
    duplicated = feed.unionByName(feed)
    return duplicated.groupBy("orderkey", "linenumber").agg(F.min("qty").alias("qty"))
