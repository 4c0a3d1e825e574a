"""Sorts, limits, top-k, deterministic shuffle — SURVEY.md §2.6."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from itdb_spark.catalog import Tables
from itdb_spark.queries import register


@register(
    "sort-name",
    oracle="SELECT p_partkey, p_name FROM part ORDER BY p_name, p_partkey",
    doc="ORDER BY string key — track lists `ORDER BY Name` (itdb2html.py:331). "
    "Spark range-partitions the sort; output order is total thanks to the "
    "p_partkey tie-break.",
)
def sort_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Tables(spark, sf_dir).part.select("p_partkey", "p_name").orderBy("p_name", "p_partkey")


@register(
    "sort-count",
    oracle="""
    SELECT s_nationkey AS nationkey, count(*) AS cnt
    FROM supplier GROUP BY 1 ORDER BY cnt DESC, nationkey
    """,
    doc="ORDER BY derived count desc (orphaned_files:123-125).",
)
def sort_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.supplier.groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("nationkey"))
    )


@register(
    "topk-shrink",
    oracle="""
    SELECT custkey, n_orders, acctbal_cents FROM (
      SELECT * FROM (
        SELECT c.c_custkey AS custkey, count(*) AS n_orders,
               CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_acctbal
        ORDER BY n_orders DESC, custkey
        LIMIT 20
      ) ORDER BY acctbal_cents DESC, custkey
      LIMIT 10
    )
    """,
    doc="Two-phase top-k (`shrink`): cut to 2K by a cheap key, re-sort by the "
    "expensive key, cut to K (itdb2html.py:445-458). Spark compiles each "
    "phase to TakeOrderedAndProject — no global sort materialization.",
)
def topk_shrink(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    k = 10
    by_orders = (
        t.customer.join(t.orders, t.customer.c_custkey == t.orders.o_custkey)
        .groupBy(F.col("c_custkey").alias("custkey"), F.col("c_acctbal"))
        .agg(F.count("*").alias("n_orders"))
        .select(
            "custkey",
            "n_orders",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_cents"),
        )
    )
    phase1 = by_orders.orderBy(F.desc("n_orders"), F.asc("custkey")).limit(2 * k)
    return phase1.orderBy(F.desc("acctbal_cents"), F.asc("custkey")).limit(k)


@register(
    "sort-shuffle",
    oracle="""
    SELECT p_partkey, row_number() OVER (ORDER BY md5(CAST(p_partkey AS VARCHAR)), p_partkey)
           AS position
    FROM part
    """,
    doc="Random permutation for playlist order (`random.shuffle`, "
    "playlistlinks.py:186-189) — made deterministic by ordering on a hash "
    "of the key (seeded shuffle), so the oracle can reproduce it. "
    "`orderBy(rand(seed))` is the non-oracle equivalent. Registered in the "
    "scale-safe bucketed form (ranged_row_number): positions come from a "
    "2-hex-char hash-prefix bucket (256 buckets, order-consistent with the "
    "full hash) + per-bucket numbering + boundary offsets — no "
    "single-partition Exchange over the data.",
)
def sort_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from itdb_spark.plans.library import ranged_row_number

    t = Tables(spark, sf_dir)
    base = t.part.select("p_partkey", F.md5(F.col("p_partkey").cast("string")).alias("_h"))
    numbered = ranged_row_number(
        base, ["_h", "p_partkey"], out_col="position", bucket=F.substring("_h", 1, 2)
    )
    return numbered.select("p_partkey", "position")


@register(
    "sort-sum",
    oracle="""
    SELECT checksum, doc_id FROM (
      SELECT md5(substr(text, 1, 32)) AS checksum, doc_id FROM documents
    ) ORDER BY checksum, doc_id
    """,
    doc="External sort of fingerprints feeding adjacent-dup detection "
    "(`sum out/*/* | sort -n`, dupes/finddupes.py:5).",
)
def sort_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.documents.select(F.md5(F.substring("text", 1, 32)).alias("checksum"), "doc_id")
        .orderBy("checksum", "doc_id")
    )
