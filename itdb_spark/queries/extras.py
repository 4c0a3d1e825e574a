"""Remaining operator-inventory entries: literal sort variants, URL
remapping, the raw-SQL public API, and the ffprobe enrichment pipeline."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from itdb_spark.catalog import Tables, register_views
from itdb_spark.queries import register


@register(
    "sort-rating",
    oracle="""
    SELECT CAST(round(value) AS BIGINT) AS rating, count(*) AS cnt
    FROM events WHERE event_type = 'view' GROUP BY 1 ORDER BY rating
    """,
    doc="GROUP BY Rating ORDER BY Rating numeric sort (itdb2html.py:317).",
)
def sort_rating(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.events.where(F.col("event_type") == "view")
        .groupBy(F.round("value").cast("long").alias("rating"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("rating")
    )


@register(
    "sort-text",
    oracle="""
    SELECT concat(source, '/', CAST(doc_id AS VARCHAR)) AS line
    FROM documents ORDER BY line
    """,
    doc="Lexicographic output sort for text reports (orphaned_files:132-137).",
)
def sort_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.documents.select(
        F.concat("source", F.lit("/"), F.col("doc_id").cast("string")).alias("line")
    ).orderBy("line")


@register(
    "fn-remap",
    oracle="""
    SELECT p_partkey,
           CASE
             WHEN loc LIKE 'file://localhost/Volumes/Data/%'
               THEN concat('/mnt/data/', substr(loc, length('file://localhost/Volumes/Data/') + 1))
             WHEN loc LIKE 'file://localhost/%'
               THEN concat('/', substr(loc, length('file://localhost/') + 1))
             ELSE loc
           END AS remapped
    FROM (
      SELECT p_partkey,
             CASE WHEN p_partkey % 3 = 0
                  THEN concat('file://localhost/Volumes/Data/', p_name)
                  ELSE concat('file://localhost/', p_name) END AS loc
      FROM part
    )
    """,
    doc="Longest-prefix URL remapping table (`[remapping]` config, "
    "itdb2html.py:151-156, :196-203) → ordered when-chain (longest "
    "prefix first).",
)
def fn_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    loc = F.when(
        F.col("p_partkey") % 3 == 0,
        F.concat(F.lit("file://localhost/Volumes/Data/"), F.col("p_name")),
    ).otherwise(F.concat(F.lit("file://localhost/"), F.col("p_name")))
    base = t.part.select("p_partkey", loc.alias("loc"))
    remaps = [  # longest prefix first — order is the semantics
        ("file://localhost/Volumes/Data/", "/mnt/data/"),
        ("file://localhost/", "/"),
    ]
    expr = None
    for prefix, target in remaps:
        cond = F.col("loc").startswith(prefix)
        val = F.concat(F.lit(target), F.expr(f"substr(loc, {len(prefix) + 1})"))
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    return base.select("p_partkey", expr.otherwise(F.col("loc")).alias("remapped"))


_Q1_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
             AS sum_disc_cents,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
"""


@register(
    "api-sql",
    oracle=_Q1_SQL,
    doc="The raw-SQL public API: the reference's purest entry point is a "
    "SQL string (sql_to_playlist:58-73) → spark.sql over registered "
    "views. Shown on a TPC-H-Q1-shaped aggregate (integer-cents money).",
    bench=True,
)
def api_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, tables=("lineitem",))
    return spark.sql(_Q1_SQL)


@register(
    "src-ffprobe",
    oracle=None,  # subprocess/stub probe — rows-only
    doc="Per-file media-probe fan-out (itdbmetadata.py:135-157): anti-join "
    "picks unprobed files, mapInPandas runs ffprobe per file with error "
    "capture, from_json+posexplode lands one row per stream. ffprobe "
    "binary absent here → deterministic stub prober; plumbing is real.",
)
def src_ffprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from itdb_spark.sources.ffprobe import explode_streams, probe_files

    t = Tables(spark, sf_dir)
    files = t.part.limit(50).select(
        F.col("p_partkey").cast("string").alias("Persistent_ID"),
        F.concat(F.lit("/media/"), F.col("p_name"), F.lit(".m4v")).alias("path"),
    )
    probed = probe_files(files)
    streams = explode_streams(probed)
    return streams.select(
        "Persistent_ID",
        "stream_index",
        F.get_json_object("stream", "$.height").cast("int").alias("height"),
    )


@register(
    "agg-approx",
    oracle=None,  # sketch results are engine-specific — rows-only
    doc="Approximate aggregates for the 100 TB path: approx_count_distinct "
    "(HyperLogLog++) and percentile_approx over lineitem — the scale "
    "substitutes for agg-cdistinct / exact quantiles.",
)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.lineitem.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000).alias("price_quantiles"),
    )
