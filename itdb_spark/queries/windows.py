"""Window functions — SURVEY.md §2.5. The reference predates SQL window
functions and emulates them with sorted scans and driver-side counters;
here they are real windows. Every window ORDER BY carries a full
deterministic tie-break so results are oracle-reproducible."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from itdb_spark.catalog import Tables
from itdb_spark.queries import register


@register(
    "win-lag",
    oracle="""
    SELECT orderkey, linenumber, price_cents FROM (
      SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
             lag(CAST(round(l_extendedprice * 100) AS BIGINT))
               OVER (ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT),
                     l_orderkey, l_linenumber) AS prev_cents
      FROM lineitem
    ) WHERE price_cents = prev_cents
    """,
    doc="Adjacent-duplicate detection: sort checksums, flag rows equal to the "
    "previous row (dupes/finddupes.py:3-18). Registered in the SCALE-SAFE "
    "form (the adjacent_dupes_scalable pattern, plans/library.py): under "
    "the global (price_cents, orderkey, linenumber) order, rows flagged "
    "equal-to-previous are exactly every row but the first within each "
    "price_cents group — so the window PARTITIONS BY the value instead of "
    "ordering the world by it. One hash shuffle on near-unique keys; no "
    "single-partition Exchange (asserted in tests/test_scale_paths.py). "
    "Result identical to the literal lag()-over-global-sort oracle.",
)
def win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    base = t.lineitem.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        cents.alias("price_cents"),
    )
    w = Window.partitionBy("price_cents").orderBy("orderkey", "linenumber")
    return (
        base.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") > 1)
        .select("orderkey", "linenumber", "price_cents")
    )


@register(
    "win-seq",
    oracle="""
    SELECT o_orderkey AS orderkey,
           CAST(row_number() OVER (ORDER BY o_orderdate, o_orderkey) + 100 AS BIGINT) AS seq
    FROM orders
    """,
    doc="Sequential numbering continuing across outputs (`--start_number`, "
    "playlistlinks.py:192,:211-221,:385-386) → global row_number + offset, "
    "registered in the scale-safe bucketed form: order-date buckets + "
    "per-bucket numbering + boundary offsets (ranged_row_number, "
    "plans/library.py) — no single-partition Exchange over the data.",
)
def win_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from itdb_spark.plans.library import ranged_row_number

    t = Tables(spark, sf_dir)
    base = t.orders.select(F.col("o_orderkey").alias("orderkey"), "o_orderdate")
    numbered = ranged_row_number(base, ["o_orderdate", "orderkey"], start=100, out_col="seq")
    return numbered.select("orderkey", "seq")


@register(
    "win-share",
    oracle="""
    SELECT event_type, cnt,
           round(100.0 * cnt / CAST(sum(cnt) OVER () AS DOUBLE), 2) AS pct
    FROM (SELECT event_type, count(*) AS cnt FROM events GROUP BY 1)
    """,
    doc="Percent-of-total via unbounded window sum (itdb2html.py:400-408).",
)
def win_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    hist = t.events.groupBy("event_type").agg(F.count("*").alias("cnt"))
    total = F.sum("cnt").over(Window.partitionBy())
    return hist.select(
        "event_type",
        "cnt",
        F.round(F.lit(100.0) * F.col("cnt") / total.cast("double"), 2).alias("pct"),
    )


@register(
    "win-topk-group",
    oracle="""
    SELECT custkey, orderkey, price_cents FROM (
      SELECT o_custkey AS custkey, o_orderkey AS orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY round(o_totalprice * 100) DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    doc="Top-K per group — the scale generalization of the reference's "
    "driver-side top-k (itdb2html.py:445-458): row_number over a "
    "partitioned window prunes per-group, no global sort.",
    bench=True,
)
def win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = Window.partitionBy("o_custkey").orderBy(F.desc(F.round(F.col("o_totalprice") * 100)), F.asc("o_orderkey"))
    return (
        t.orders.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            cents.alias("price_cents"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
        .select("custkey", "orderkey", "price_cents")
    )


@register(
    "win-ewma",
    oracle="""
    WITH cents AS (
      SELECT event_id, user_id, ts,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL
    ),
    lasts AS (
      SELECT event_id, user_id,
             list(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS xs
      FROM cents
    ),
    folded AS (
      SELECT event_id, user_id,
             list_sum(list_transform(range(1, len(xs) + 1),
               p -> xs[p] * ([16384, 12288, 9216, 6912, 5184, 3888, 2916,
                              2187])[len(xs) - p + 1])) AS num,
             ([16384, 28672, 37888, 44800, 49984, 53872, 56788,
               58975])[len(xs)] AS den
      FROM lasts
    )
    SELECT event_id, user_id,
           CAST((1000 * num) // den AS BIGINT) AS ewma_milli
    FROM folded
    """,
    doc="Integer-exact truncated EWMA per user (alpha = 1/4 over the "
    "last 8 events): the monitoring/fraud smoother, with the repo's "
    "no-float discipline — recursive y_t = x/4 + 3y/4 truncated to an "
    "8-term window gives EXACT integer weights 3^i * 4^(7-i) over "
    "integer cents, emitted as milli-units via integer DIV, so an "
    "inherently order-recursive time-series operator hash-gates "
    "bit-for-bit (a float recurrence never could — summation error "
    "accumulates with stream length). One exchange: the per-user "
    "ordered frame collects the trailing 8 values and a per-row array "
    "fold does the rest — same cost shape as win-lag, state bounded "
    "by the window length at any scale.",
)
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-7, Window.currentRow)
    )
    lasts = t.events.where(F.col("value").isNotNull()).select(
        "event_id",
        "user_id",
        F.collect_list(F.round(F.col("value") * 100).cast("long")).over(w).alias("xs"),
    )
    # INTEGER LITERAL weights, not pow(): libm pow is only 1-ulp-exact
    # and Spark CASTs doubles by truncation while DuckDB rounds, so one
    # inexact pow(3, k) would diverge the hash gate (code review);
    # W[i+1] = 3^i * 4^(7-i), D[s] = prefix sum = the denominator for a
    # size-s window — and den needs no per-element fold at all
    num = (
        "aggregate(zip_with(xs, sequence(1, size(xs)), (x, p) -> "
        "x * element_at(array(16384L, 12288L, 9216L, 6912L, 5184L, 3888L, "
        "2916L, 2187L), size(xs) - p + 1)), 0L, (a, v) -> a + v)"
    )
    den = (
        "element_at(array(16384L, 28672L, 37888L, 44800L, 49984L, 53872L, "
        "56788L, 58975L), size(xs))"
    )
    return lasts.select(
        "event_id",
        "user_id",
        F.expr(f"CAST((1000 * ({num})) DIV ({den}) AS BIGINT)").alias("ewma_milli"),
    )
