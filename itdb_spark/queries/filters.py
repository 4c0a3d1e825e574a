"""Projections, filters, predicates — SURVEY.md §2.2, re-expressed over the
driver testdata star schema. Each query keeps the reference operator's exact
semantics (null-safe bucketization, non-empty guards, case-sensitive regex,
raw predicate pass-through) on analogous columns."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from itdb_spark.catalog import Tables
from itdb_spark.functions.core import stars
from itdb_spark.queries import register

# --- projections -----------------------------------------------------------


@register(
    "proj-cols",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
           l_quantity AS qty, CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
           l_returnflag AS returnflag
    FROM lineitem
    """,
    doc="Explicit aliased projection list (playlistlinks.py:62-94): column "
    "pruning reaches the parquet scan via Catalyst.",
)
def proj_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.lineitem.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.col("l_quantity").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"),
        F.col("l_returnflag").alias("returnflag"),
    )


@register(
    "proj-star",
    oracle="SELECT * FROM nation",
    doc="SELECT * full-row fetch (itdb2html.py:331, :508-514).",
)
def proj_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Tables(spark, sf_dir).nation.select("*")


@register(
    "proj-schema-driven",
    oracle="SELECT c_custkey, c_name, c_acctbal FROM customer",
    doc="Schema-driven projection: desired column list intersected with the "
    "live schema, tolerating unknown fields (itdbloader.py:150,165-168; "
    "DESCRIBE-driven at :249-258).",
)
def proj_schema_driven(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = Tables(spark, sf_dir).customer
    desired = ["c_custkey", "c_name", "c_phone", "c_address", "c_acctbal"]
    present = [c for c in desired if c in df.schema.fieldNames()]
    return df.select(*present)


# --- filters ---------------------------------------------------------------


@register(
    "flt-tenant",
    oracle="SELECT event_id, user_id, event_type FROM events WHERE user_id = 7",
    doc="Tenant filter `WHERE User_ID = %d` on every query (itdb2html.py:275 "
    "et al.) — pushed down to the parquet scan.",
)
def flt_tenant(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.events.where(F.col("user_id") == 7).select("event_id", "user_id", "event_type")


@register(
    "flt-eq",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS linenumber
    FROM lineitem WHERE l_returnflag = 'R'
    """,
    doc="Equality predicate on a dynamic column (itdb2html.py:543-546).",
)
def flt_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.where(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("orderkey"), F.col("l_linenumber").alias("linenumber"))
    )


@register(
    "flt-nonempty",
    oracle="""
    SELECT p_partkey, p_type FROM part
    WHERE p_type IS NOT NULL AND length(p_type) != 0
    """,
    doc="Null/empty guard `X IS NOT NULL AND LENGTH(X) != 0` "
    "(itdb2html.py:295-296).",
)
def flt_nonempty(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.part.where(F.col("p_type").isNotNull() & (F.length("p_type") != 0)).select(
        "p_partkey", "p_type"
    )


@register(
    "flt-bool",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
    WHERE o_orderstatus = 'F' OR o_orderpriority = '1-URGENT'
    """,
    doc="Boolean-flag disjunction `TV_Show OR Movie` (itdbmetadata.py:128-131).",
)
def flt_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.orders.where(
        (F.col("o_orderstatus") == "F") | (F.col("o_orderpriority") == "1-URGENT")
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority")


@register(
    "flt-like",
    oracle="SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%blue%'",
    doc="LIKE pattern playlist search (playlistlinks.py:139-144).",
)
def flt_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.part.where(F.col("p_name").like("%blue%")).select("p_partkey", "p_name")


@register(
    "flt-regex",
    oracle=r"""
    SELECT p_partkey, p_name FROM part
    WHERE p_type = 'ECONOMY' AND regexp_matches(p_name, '^[a-z]+ [a-z]+$')
    """,
    doc="Case-sensitive regex `kind=... AND name REGEXP BINARY ...` "
    "(README.md:145-146); Spark rlike is case-sensitive already.",
)
def flt_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.part.where(
        (F.col("p_type") == "ECONOMY") & F.col("p_name").rlike(r"^[a-z]+ [a-z]+$")
    ).select("p_partkey", "p_name")


@register(
    "flt-where-passthru",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > 100000 AND o_orderstatus = 'O'
    """,
    doc="Raw user predicate spliced verbatim (`--where` / `--sql`, "
    "playlistlinks.py:177-184; sql_to_playlist:58-73) → F.expr pass-through.",
)
def flt_where_passthru(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    user_where = "o_totalprice > 100000 AND o_orderstatus = 'O'"
    return t.orders.where(F.expr(user_where)).select("o_orderkey", "o_totalprice")


@register(
    "flt-stars",
    oracle="""
    SELECT event_id, value FROM events
    WHERE CAST(floor(coalesce(value, 0) / 20) AS BIGINT) = 3
    """,
    doc="Derived-bucket filter `FLOOR(Rating/20) = %d` (itdb2html.py:516-517).",
)
def flt_stars(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.events.where(stars("value") == 3).select("event_id", "value")


@register(
    "expr-stars",
    oracle="""
    SELECT event_id, CAST(floor(coalesce(value, 0) / 20) AS BIGINT) AS stars
    FROM events
    """,
    doc="Null-safe star bucketization — the signature derived column "
    "`CASE WHEN ISNULL(Rating) THEN 0 ELSE FLOOR(Rating/20) END` "
    "(itdbloader.py:273-277; itdb2html.py:265-271).",
)
def expr_stars(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.events.select("event_id", stars("value").alias("stars"))


@register(
    "expr-exclude-prefix",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE NOT (p_name LIKE 'small %' OR p_name LIKE 'red %' OR p_name LIKE 'hot %')
    """,
    doc="Multi-prefix exclusion filter (drop `.DS_Store`, `./tones/`, ... — "
    "orphaned_files:91-99).",
)
def expr_exclude_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    excluded = ["small ", "red ", "hot "]
    pred = None
    for p in excluded:
        c = F.col("p_name").startswith(p)
        pred = c if pred is None else (pred | c)
    return t.part.where(~pred).select("p_partkey", "p_name")
