"""Aggregations — SURVEY.md §2.4. The reference's star-histogram family
(GROUP BY thing × stars → COUNT) plus profiling, JSON aggregation, and the
materialized playlist_stats layer collapsed from the reference's N+1 loop
into single shuffles (itdbloader.py:260-293).

Float discipline for oracle parity: money sums go through integer cents
(`CAST(round(x*100) AS BIGINT)`) so summation order can't perturb values;
ratios divide exact integers and round."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from itdb_spark.catalog import Tables
from itdb_spark.functions.core import stars
from itdb_spark.queries import register


def _price_bucket(col: str) -> F.Column:
    """Price → 0..N bucket, the o_totalprice analog of FLOOR(Rating/20)."""
    return F.floor(F.coalesce(F.col(col), F.lit(0)) / 50000)


@register(
    "agg-hist-genre",
    oracle="""
    SELECT coalesce(o_orderpriority, '') AS genre,
           CAST(floor(coalesce(o_totalprice, 0) / 50000) AS BIGINT) AS stars,
           count(*) AS cnt
    FROM orders GROUP BY 1, 2
    """,
    doc="2-key hash agg `GROUP BY COALESCE(Genre,''), Stars → COUNT(*)` — "
    "the genre × star histogram (itdb2html.py:264-284). Map-side partial "
    "aggregation makes this one shuffle of (group, count) pairs.",
    bench=True,
)
def agg_hist_genre(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders.groupBy(
            F.coalesce("o_orderpriority", F.lit("")).alias("genre"),
            _price_bucket("o_totalprice").alias("stars"),
        )
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "agg-hist-thing",
    oracle="""
    SELECT o_orderstatus AS thing,
           CAST(floor(coalesce(o_totalprice, 0) / 50000) AS BIGINT) AS stars,
           count(*) AS cnt
    FROM orders
    WHERE o_orderstatus IS NOT NULL AND length(o_orderstatus) != 0
    GROUP BY 1, 2
    """,
    doc="Parameterized 2-key agg grouped by a dynamic column with non-empty "
    "guard (itdb2html.py:286-308).",
)
def agg_hist_thing(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    thing = "o_orderstatus"  # dynamic in the reference: Artist | Album
    return (
        t.orders.where(F.col(thing).isNotNull() & (F.length(thing) != 0))
        .groupBy(F.col(thing).alias("thing"), _price_bucket("o_totalprice").alias("stars"))
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "agg-hist-overall",
    oracle="""
    SELECT CAST(floor(coalesce(value, 0) / 20) AS BIGINT) AS stars, count(*) AS cnt
    FROM events GROUP BY 1
    """,
    doc="Library-wide 1-key ratings histogram (itdb2html.py:386-398).",
)
def agg_hist_overall(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.events.groupBy(stars("value").alias("stars")).agg(F.count("*").alias("cnt"))


@register(
    "agg-hist-where",
    oracle="""
    SELECT CAST(round(value) AS BIGINT) AS rating, count(*) AS cnt
    FROM events WHERE event_type = 'click' GROUP BY 1
    """,
    doc="Filtered histogram for one genre/artist/album; note the reference "
    "groups raw Rating here, not Stars (itdb2html.py:310-322).",
)
def agg_hist_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.events.where(F.col("event_type") == "click")
        .groupBy(F.round("value").cast("long").alias("rating"))
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "agg-pl-stats",
    oracle="""
    SELECT o.o_orderpriority AS playlist,
           CAST(floor(coalesce(l.l_quantity, 0) / 20) AS BIGINT) AS stars,
           count(*) AS cnt
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
    """,
    doc="Materialized per-playlist star histogram: the reference runs one "
    "join+GROUP BY per playlist (N+1 loop, itdbloader.py:260-293); here it "
    "is ONE join + ONE shuffle grouped by (playlist, stars).",
    bench=True,
)
def agg_pl_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.join(t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey)
        .groupBy(
            F.col("o_orderpriority").alias("playlist"),
            stars("l_quantity").alias("stars"),
        )
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "agg-pl-restat",
    oracle="""
    SELECT stars, CAST(sum(cnt) AS BIGINT) AS total FROM (
      SELECT o.o_orderpriority AS playlist,
             CAST(floor(coalesce(l.l_quantity, 0) / 20) AS BIGINT) AS stars,
             count(*) AS cnt
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ) GROUP BY stars
    """,
    doc="Re-aggregation of the materialized aggregate: `SELECT Stars, "
    "SUM(Count) FROM playlist_stats GROUP BY Stars` (itdb2html.py:478-493). "
    "Equivalence with direct aggregation is asserted in tests.",
)
def agg_pl_restat(spark: SparkSession, sf_dir: str) -> DataFrame:
    materialized = agg_pl_stats(spark, sf_dir)
    return materialized.groupBy("stars").agg(F.sum("cnt").alias("total"))


@register(
    "agg-count",
    oracle="SELECT count(*) AS cnt FROM lineitem",
    doc="Scalar COUNT(*) sanity check (itdb2html.py:372-374; README.md:59).",
)
def agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Tables(spark, sf_dir).lineitem.agg(F.count("*").alias("cnt"))


@register(
    "agg-cdistinct",
    oracle="""
    SELECT count(DISTINCT c_mktsegment) AS n_segments,
           count(DISTINCT c_nationkey) AS n_nations
    FROM customer
    """,
    doc="COUNT(DISTINCT col) — total albums/artists (itdb2html.py:375-384). "
    "At 100 TB use approx_count_distinct (HLL) instead; exact here for the "
    "oracle.",
)
def agg_cdistinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.customer.agg(
        F.countDistinct("c_mktsegment").alias("n_segments"),
        F.countDistinct("c_nationkey").alias("n_nations"),
    )


@register(
    "agg-json-max",
    oracle="""
    SELECT event_type, max_k FROM (
      SELECT event_type, max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      FROM events GROUP BY event_type
    ) WHERE max_k < 100
    """,
    doc="Aggregation over JSON extraction + HAVING: `MAX(JSON_EXTRACT(stream,"
    "'$.height')) ... HAVING h < 720` (itdbmetadata.py:10-11).",
)
def agg_json_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy("event_type")
        .agg(F.max(F.get_json_object("props", "$.k").cast("long")).alias("max_k"))
        .where(F.col("max_k") < 100)
    )


@register(
    "agg-quality",
    oracle="""
    SELECT playlist,
           CASE WHEN CAST(sum(CASE WHEN stars > 0 THEN cnt ELSE 0 END) AS BIGINT) * 5
                     >= CAST(sum(cnt) AS BIGINT)
                THEN round(CAST(sum(stars * cnt) AS DOUBLE)
                           / CAST(sum(CASE WHEN stars > 0 THEN cnt ELSE 0 END) AS DOUBLE), 4)
                ELSE 0.0 END AS quality
    FROM (
      SELECT o.o_orderpriority AS playlist,
             CAST(floor(coalesce(l.l_quantity, 0) / 20) AS BIGINT) AS stars,
             count(*) AS cnt
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ) GROUP BY playlist
    """,
    doc="Guarded weighted mean: quality = Σ(stars·count)/Σ(rated count) if "
    "≥20% of tracks are rated else 0 (itdb2html.py:90-98) — driver-side "
    "Python in the reference, a sum(when)/sum(when) pair here.",
)
def agg_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = agg_pl_stats(spark, sf_dir)
    rated = F.sum(F.when(F.col("stars") > 0, F.col("cnt")).otherwise(F.lit(0)))
    total = F.sum("cnt")
    weighted = F.sum(F.col("stars") * F.col("cnt"))
    return hist.groupBy("playlist").agg(
        F.when(rated * 5 >= total, F.round(weighted.cast("double") / rated.cast("double"), 4))
        .otherwise(F.lit(0.0))
        .alias("quality")
    )


@register(
    "agg-percent",
    oracle="""
    SELECT l_returnflag AS flag, cnt,
           round(100.0 * cnt / CAST(sum(cnt) OVER () AS DOUBLE), 2) AS pct
    FROM (SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY 1)
    """,
    doc="Share-of-total percent per bucket (itdb2html.py:400-408) → "
    "unbounded-window total over the aggregated (tiny) frame.",
)
def agg_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    hist = t.lineitem.groupBy(F.col("l_returnflag").alias("flag")).agg(F.count("*").alias("cnt"))
    total = F.sum("cnt").over(Window.partitionBy())
    return hist.select(
        "flag", "cnt", F.round(F.lit(100.0) * F.col("cnt") / total.cast("double"), 2).alias("pct")
    )


@register(
    "agg-dircount",
    oracle="""
    SELECT source, count(*) AS cnt FROM documents
    GROUP BY source HAVING count(*) > 3
    ORDER BY cnt DESC
    """,
    doc="Group-count + threshold + desc sort: orphans per directory, "
    "count>3 (orphaned_files:115-129).",
)
def agg_dircount(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.documents.groupBy("source")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > 3)
        .orderBy(F.desc("cnt"))
    )


@register(
    "agg-maxlen",
    oracle="""
    SELECT CAST(max(length(p_name)) AS BIGINT) AS len_p_name,
           CAST(max(length(p_brand)) AS BIGINT) AS len_p_brand,
           CAST(max(length(p_type)) AS BIGINT) AS len_p_type
    FROM part
    """,
    doc="Per-column profiling: max rendered length of every source field "
    "(itdbloader.py:170-178, :239-247) — one pass, N max(length) aggregates.",
)
def agg_maxlen(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = Tables(spark, sf_dir).part
    string_cols = [f.name for f in df.schema.fields if f.dataType.typeName() == "string"]
    return df.agg(
        *[F.max(F.length(c)).cast("long").alias(f"len_{c}") for c in string_cols]
    )


@register(
    "agg-ckgroup",
    oracle="""
    SELECT checksum, count(*) AS cnt,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM (SELECT doc_id, md5(substr(text, 1, 32)) AS checksum FROM documents)
    GROUP BY checksum HAVING count(*) > 1
    """,
    doc="Fingerprint grouping: hash a bounded content sample (the reference "
    "hashes the last 100 KB, dupes/dedup.py:42,:127-143), group, keep "
    "groups with >1 member.",
)
def agg_ckgroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.documents.select("doc_id", F.md5(F.substring("text", 1, 32)).alias("checksum"))
        .groupBy("checksum")
        .agg(
            F.count("*").alias("cnt"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .where(F.col("cnt") > 1)
    )


@register(
    "agg-histeq",
    oracle="""
    WITH cents AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
             o_orderkey
      FROM orders
    ),
    ranked AS (
      SELECT c,
             CAST(row_number() OVER (ORDER BY c, o_orderkey) AS BIGINT) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM cents
    ),
    bucketed AS (
      SELECT c, ((rn - 1) * 10) // n AS bucket FROM ranked
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(c) AS BIGINT) AS lo_cents,
           CAST(max(c) AS BIGINT) AS hi_cents,
           CAST(count(DISTINCT c) AS BIGINT) AS ndv
    FROM bucketed GROUP BY bucket
    """,
    doc="Equi-depth histogram of order totals (10 buckets) — the "
    "ANALYZE-statistics shape a cost-based optimizer keeps per column "
    "(Spark's own CBO stores exactly this): bucket boundaries at exact "
    "rank deciles with a full (value, key) tie-break, per-bucket row "
    "count, bounds, and NDV, all in integer cents. The rank window is "
    "a global sort at test SF; the 100 TB form is the "
    "ranged_row_number two-phase plan (bucket on a value prefix, "
    "per-bucket ranks + broadcast offsets) or a single "
    "percentile_approx pass for approximate boundaries — both "
    "documented in SCALE.md; the exact form here is the correctness "
    "baseline those approximate.",
)
def agg_histeq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    cents = t.orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
        "o_orderkey",
    )
    n = cents.agg(F.count("*").cast("long").alias("n"))
    w = Window.orderBy("c", "o_orderkey")
    ranked = cents.select(
        "c", F.row_number().over(w).cast("long").alias("rn")
    ).crossJoin(F.broadcast(n))
    return (
        ranked.select("c", F.expr("((rn - 1) * 10) DIV n").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("c").cast("long").alias("lo_cents"),
            F.max("c").cast("long").alias("hi_cents"),
            F.countDistinct("c").cast("long").alias("ndv"),
        )
        .select(F.col("bucket").cast("long"), "n_rows", "lo_cents", "hi_cents", "ndv")
    )
