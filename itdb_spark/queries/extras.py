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
    "api-sql-param",
    oracle="""
    SELECT c_custkey, c_name, CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
    FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_acctbal >= 1000.0
    """,
    doc="Parameterized SQL API: spark.sql with named bind parameters — the "
    "injection-safe replacement for the reference's string-spliced values "
    "(MySQLdb.escape_string interpolation, itdb2html.py:501,:543; "
    "SURVEY.md §2.8). The values never enter the SQL text, so a hostile "
    "segment name can't break out of the literal.",
)
def api_sql_param(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, tables=("customer",))
    return spark.sql(
        """
        SELECT c_custkey, c_name, CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
        FROM customer
        WHERE c_mktsegment = :segment AND c_acctbal >= :min_bal
        """,
        args={"segment": "BUILDING", "min_bal": 1000.0},
    )


@register(
    "src-ffprobe",
    oracle="""
    SELECT CAST(p_partkey AS VARCHAR) AS Persistent_ID,
           CAST(0 AS INTEGER) AS stream_index,
           CAST(CASE byte_sum % 3 WHEN 0 THEN 480 WHEN 1 THEN 720
                ELSE 1080 END AS INTEGER) AS height
    FROM (
      SELECT p_partkey,
             list_sum(list_transform(range(1, len(path) + 1),
                                     i -> ascii(substr(path, i, 1)))) AS byte_sum
      FROM (SELECT p_partkey, concat('/media/', p_name, '.m4v') AS path
            FROM part WHERE p_partkey <= 50)
    )
    """,
    doc="Per-file media-probe fan-out (itdbmetadata.py:135-157): anti-join "
    "picks unprobed files, mapInPandas runs the probe per file with error "
    "capture, from_json+posexplode lands one row per stream. The gate "
    "pins the deterministic stub prober (path-byte-sum → height), so the "
    "WHOLE pipeline — mapInPandas batch iteration, JSON landing, "
    "from_json stream explode, get_json_object typed access — is "
    "hash-verified against a DuckDB oracle that recomputes the stub "
    "(ascii == utf-8 byte for the ASCII part names); swap "
    "prober=real_probe where ffprobe exists, same plumbing.",
)
def src_ffprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from itdb_spark.sources.ffprobe import explode_streams, probe_files, stub_probe

    t = Tables(spark, sf_dir)
    files = t.part.where(F.col("p_partkey") <= 50).select(
        F.col("p_partkey").cast("string").alias("Persistent_ID"),
        F.concat(F.lit("/media/"), F.col("p_name"), F.lit(".m4v")).alias("path"),
    )
    probed = probe_files(files, prober=stub_probe)
    streams = explode_streams(probed)
    return streams.select(
        "Persistent_ID",
        "stream_index",
        F.get_json_object("stream", "$.height").cast("int").alias("height"),
    )


@register(
    "fn-strings",
    oracle="""
    SELECT p_partkey,
           array_to_string(
             list_transform(string_split(lower(p_name), ' '),
                            w -> concat(upper(w[1]), w[2:])), ' ') AS title_name,
           replace(replace(p_name, '&', '%26'), ' ', '%20') AS url_encoded,
           format('{:,}', CAST(round(p_retailprice * 100) AS BIGINT)) AS price_display,
           split_part(concat('/music/', p_brand, '/', p_name, '.mp3'), '/', -1) AS basename,
           regexp_extract(concat('/music/', p_brand, '/', p_name, '.mp3'),
                          '^(.*)/[^/]*$', 1) AS dirname
    FROM part
    """,
    doc="Scalar string toolkit (SURVEY.md §2.8): capwords/initcap "
    "(itdb2html.py:173-175), url-encode for links (itdb2html.py:167-168), "
    "locale thousands formatting (itdb2html.py:419-421), dirname/basename "
    "path splits (orphaned_files:117; playlistlinks.py:213).",
)
def fn_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    path = F.concat(F.lit("/music/"), F.col("p_brand"), F.lit("/"), F.col("p_name"), F.lit(".mp3"))
    return t.part.select(
        "p_partkey",
        F.initcap(F.lower("p_name")).alias("title_name"),
        # manual %-encode of the two chars the reference's links need —
        # DuckDB has no url_encode, so both sides use the same chain
        F.regexp_replace(F.regexp_replace("p_name", "&", "%26"), " ", "%20").alias("url_encoded"),
        F.format_number(F.round(F.col("p_retailprice") * 100).cast("long"), 0).alias(
            "price_display"
        ),
        F.substring_index(path, "/", -1).alias("basename"),
        F.regexp_extract(path, r"^(.*)/[^/]*$", 1).alias("dirname"),
    )


@register(
    "agg-salted",
    oracle="""
    SELECT l_returnflag AS flag,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem GROUP BY 1
    """,
    doc="Salted two-phase aggregation for skewed group keys (the reference's "
    "'Library' playlist holds every track — one key with half the table): "
    "phase 1 groups on (key, salt), phase 2 merges partials. The oracle is "
    "the UNsalted equivalent — salting must be semantically invisible.",
)
def agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from itdb_spark.operators.skew import salted_count, salted_sum

    t = Tables(spark, sf_dir)
    li = t.lineitem.select(F.col("l_returnflag").alias("flag"),
                           F.round("l_quantity").cast("long").alias("qty"))
    counts = salted_count(li, ["flag"], cnt_alias="cnt")
    sums = salted_sum(li, ["flag"], F.col("qty"), alias="total_qty")
    return counts.join(sums, "flag")


@register(
    "join-salted",
    oracle="""
    SELECT p.p_brand AS brand,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
    FROM (
      SELECT CASE WHEN l_orderkey % 3 = 0 THEN 1 ELSE l_partkey END AS k,
             l_quantity
      FROM lineitem
    ) l JOIN part p ON l.k = p.p_partkey
    GROUP BY 1
    """,
    doc="Skew-safe join (operators/skew.py skew_safe_join): a synthetic "
    "hot key — every third lineitem rerouted to partkey 1, a single key "
    "holding a third of the fact table — joins `part` via "
    "split-broadcast-union: pre-flight per-key counts pick the hot keys, "
    "hot rows take a BROADCAST join (the monster key never lands on one "
    "reducer), cold rows take the normal shuffled join. The oracle is the "
    "PLAIN join — the rewrite must be semantically invisible. The "
    "companion pre-flight is agg-skewcheck; plan shape (hot side "
    "broadcasts, cold side shuffles) is CI-asserted in "
    "tests/test_scale_paths.py.",
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from itdb_spark.operators.skew import skew_safe_join

    t = Tables(spark, sf_dir)
    li = t.lineitem.select(
        F.when(F.col("l_orderkey") % 3 == 0, F.lit(1))
        .otherwise(F.col("l_partkey"))
        .alias("k"),
        F.round("l_quantity").cast("long").alias("qty"),
    )
    pt = t.part.select(F.col("p_partkey").alias("k"), "p_brand")
    joined = skew_safe_join(li, pt, ["k"], hot_threshold=1000)
    return joined.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum("qty").cast("long").alias("total_qty"),
    )


@register(
    "join-asof",
    oracle="""
    SELECT event_id, user_id,
           CAST(floor(epoch(prev_error_ts)) AS BIGINT) AS prev_error_epoch
    FROM (
      SELECT event_id, user_id, ts,
             max(CASE WHEN event_type = 'error' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_error_ts
      FROM events
    ) WHERE prev_error_ts IS NOT NULL
    """,
    doc="As-of join (Spark has no native one, SURVEY.md §2.3 notes none in "
    "the reference either): for each event, the most recent STRICTLY "
    "earlier 'error' event of the same user — a conditional running max "
    "over an ordered window; the merge_asof/applyInPandas form is the "
    "two-table variant.",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_err = F.max(F.when(F.col("event_type") == "error", F.col("ts"))).over(w)
    return (
        t.events.select("event_id", "user_id", prev_err.alias("prev_error_ts"))
        .where(F.col("prev_error_ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.unix_timestamp("prev_error_ts").alias("prev_error_epoch"),
        )
    )


@register(
    "join-asof2",
    oracle="""
    WITH l AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type <> 'error'),
    r AS (SELECT user_id, ts AS error_ts, max(event_id) AS error_id
          FROM events WHERE event_type = 'error' AND ts IS NOT NULL
          GROUP BY 1, 2)
    SELECT lnn.event_id, lnn.user_id, r.error_id,
           CAST(floor(epoch(r.error_ts)) AS BIGINT) AS error_epoch
    FROM (SELECT * FROM l WHERE ts IS NOT NULL) lnn
    ASOF LEFT JOIN r
      ON lnn.user_id = r.user_id AND lnn.ts >= r.error_ts
    UNION ALL
    SELECT event_id, user_id, NULL, NULL FROM l WHERE ts IS NULL
    """,
    doc="TWO-TABLE as-of join (operators/asof.py::asof_join — the "
    "merge_asof form join-asof's docstring names): every non-error event "
    "joined to the latest error event of the same user at or before its "
    "timestamp, nulls when none precedes it. Union-tag implementation: "
    "both tables tagged and unioned, one per-key ordered window carries "
    "the last right-side payload struct forward (last ignorenulls) — ONE "
    "exchange total, no join shuffle, no applyInPandas. The oracle is "
    "DuckDB's native ASOF LEFT JOIN — an independent as-of "
    "implementation, not a transcription of the window.",
)
def join_asof2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from itdb_spark.operators.asof import asof_join

    t = Tables(spark, sf_dir)
    left = t.events.where(F.col("event_type") != "error").select(
        "event_id", "user_id", "ts"
    )
    right = (
        t.events.where(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("error_id"))
        .select("user_id", F.col("ts").alias("error_ts"), "error_id")
    )
    out = asof_join(left, right, on="user_id", left_ts="ts", right_ts="error_ts")
    return out.select(
        "event_id",
        "user_id",
        "error_id",
        F.unix_timestamp("error_ts").alias("error_epoch"),
    )


@register(
    "join-range",
    oracle="""
    SELECT o.o_orderkey AS orderkey, count(*) AS cnt
    FROM (SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderkey % 151 = 0) o
    JOIN lineitem l
      ON l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
    GROUP BY 1
    """,
    doc="Point-in-interval range join (no native Spark range join): "
    "bucketize time, explode intervals into overlapped buckets, "
    "equi-join on bucket, exact range filter — shuffle on bucket ids, "
    "never the cross product. Oracle = the naive BETWEEN join.",
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from itdb_spark.operators.rangejoin import range_join_count

    t = Tables(spark, sf_dir)
    intervals = (
        t.orders.where(F.col("o_orderkey") % 151 == 0)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")).alias("end"),
        )
    )
    points = t.lineitem.select("l_shipdate")
    return range_join_count(points, intervals, "l_shipdate", "start", "end", "orderkey")


@register(
    "snk-merge",
    oracle="""
    SELECT c_custkey, c_name, segment FROM (
      SELECT c.c_custkey, c.c_name, c.c_mktsegment AS segment FROM customer c
      WHERE c.c_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey % 10 = 0)
      UNION ALL
      SELECT c_custkey, c_name, 'REASSIGNED' AS segment FROM customer
      WHERE c_custkey % 10 = 0
    )
    """,
    doc="MERGE upsert emulation (Delta MERGE at deploy time, SURVEY.md §7.1; "
    "REPLACE INTO semantics itdbloader.py:202-211): updates win per PK via "
    "anti-join + union — here every 10th customer is reassigned.",
)
def snk_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from itdb_spark.operators.merge import merge_upsert

    t = Tables(spark, sf_dir)
    target = t.customer.select("c_custkey", "c_name", F.col("c_mktsegment").alias("segment"))
    updates = (
        t.customer.where(F.col("c_custkey") % 10 == 0)
        .select("c_custkey", "c_name", F.lit("REASSIGNED").alias("segment"))
    )
    return merge_upsert(target, updates, ["c_custkey"])


@register(
    "agg-approx",
    oracle="""
    SELECT metric, exact_value, within_bounds FROM (
      SELECT 'approx_orders' AS metric,
             (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS exact_value,
             TRUE AS within_bounds
      UNION ALL
      SELECT 'approx_parts',
             (SELECT count(DISTINCT l_partkey) FROM lineitem), TRUE
      UNION ALL
      SELECT 'q50', (SELECT count(*) FROM lineitem), TRUE
      UNION ALL
      SELECT 'q95', (SELECT count(*) FROM lineitem), TRUE
      UNION ALL
      SELECT 'q99', (SELECT count(*) FROM lineitem), TRUE
    ) ORDER BY metric
    """,
    doc="Approximate aggregates for the 100 TB path: approx_count_distinct "
    "(HyperLogLog++) and percentile_approx over lineitem — the scale "
    "substitutes for agg-cdistinct / exact quantiles. Registered as a "
    "WITHIN-BOUNDS gate so the sketches are hash-checkable: Spark computes "
    "sketch AND exact in one pass, a second pass ranks each approx quantile "
    "within the sorted column, and each metric row reports (exact_value, "
    "within_bounds). The DuckDB oracle computes the same exact values and "
    "expects all-true — a sketch exiting its published error bound "
    "(rsd=5%%*3 for HLL++, rank-error n/accuracy for Greenwald-Khanna) now "
    "BREAKS the gate instead of hiding behind a rows-only check. At 100 TB "
    "run the sketch aggregation alone (first agg below); the exact twin "
    "exists to make the gate falsifiable at test SFs.",
)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    li = t.lineitem
    sk = li.agg(
        F.approx_count_distinct("l_partkey").alias("a_parts"),
        F.approx_count_distinct("l_orderkey").alias("a_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("q50"),
        F.percentile_approx("l_extendedprice", 0.95, 10000).alias("q95"),
        F.percentile_approx("l_extendedprice", 0.99, 10000).alias("q99"),
        F.countDistinct("l_partkey").alias("e_parts"),
        F.countDistinct("l_orderkey").alias("e_orders"),
        F.count("*").alias("n"),
    )
    # Rank pass: broadcast the 1-row sketch frame across lineitem and count
    # rows strictly-below / at-or-below each reported quantile — the exact
    # rank interval [lo, hi] the Greenwald-Khanna bound speaks about.
    price = F.col("l_extendedprice")
    ranks = (
        li.join(F.broadcast(sk))
        .groupBy("a_parts", "a_orders", "q50", "q95", "q99", "e_parts", "e_orders", "n")
        .agg(
            *[
                F.sum((price < F.col(q)).cast("long")).alias(f"lo{q[1:]}")
                for q in ("q50", "q95", "q99")
            ],
            *[
                F.sum((price <= F.col(q)).cast("long")).alias(f"hi{q[1:]}")
                for q in ("q50", "q95", "q99")
            ],
        )
    )
    # HLL++ bound: |approx − exact| ≤ 3·rsd·exact (rsd defaults to 5%).
    # GK bound: the true rank of the reported value must lie within
    # n/accuracy (+1 for the floor) of the target rank q·n.
    eps = F.col("n") / 10000 + 1

    def cd_within(approx: str, exact: str) -> F.Column:
        return F.abs(F.col(approx) - F.col(exact)) <= 0.05 * 3 * F.col(exact)

    def q_within(q: float, tag: str) -> F.Column:
        target = F.lit(q) * F.col("n")
        return (F.col(f"lo{tag}") - eps <= target) & (target <= F.col(f"hi{tag}") + eps)

    def row(metric: str, exact_col: F.Column, within: F.Column):
        return F.struct(
            F.lit(metric).alias("metric"),
            exact_col.cast("long").alias("exact_value"),
            within.alias("within_bounds"),
        )

    return (
        ranks.select(
            F.explode(
                F.array(
                    row("approx_orders", F.col("e_orders"), cd_within("a_orders", "e_orders")),
                    row("approx_parts", F.col("e_parts"), cd_within("a_parts", "e_parts")),
                    row("q50", F.col("n"), q_within(0.5, "50")),
                    row("q95", F.col("n"), q_within(0.95, "95")),
                    row("q99", F.col("n"), q_within(0.99, "99")),
                )
            ).alias("r")
        )
        .select("r.*")
        .orderBy("metric")
    )


@register(
    "join-overlap",
    oracle="""
    SELECT l.o_orderkey AS l_key, r.o_orderkey AS r_key
    FROM (SELECT o_orderkey, o_orderdate AS s, o_orderdate + INTERVAL 7 DAY AS e
          FROM orders WHERE o_orderkey % 97 = 0) l
    JOIN (SELECT o_orderkey, o_orderdate AS s, o_orderdate + INTERVAL 10 DAY AS e
          FROM orders WHERE o_orderkey % 89 = 0) r
      ON l.s <= r.e AND r.s <= l.e
    """,
    doc="Interval × interval OVERLAP join "
    "(operators/rangejoin.py::interval_overlap_join) — the two-sided "
    "sibling of join-range's point-in-interval: both interval sets "
    "explode into week buckets and equi-join on bucket; a pair is kept "
    "only in the bucket containing its overlap's own start "
    "(max of the two starts), so every overlapping pair emits exactly "
    "once with NO post-join distinct. Shuffle is on bucket ids — "
    "Σ interval-buckets, never |L|·|R|. The oracle is the naive theta "
    "join.",
)
def join_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from itdb_spark.operators.rangejoin import interval_overlap_join

    t = Tables(spark, sf_dir)

    def intervals(mod: int, days: int, key: str) -> DataFrame:
        return t.orders.where(F.col("o_orderkey") % mod == 0).select(
            F.col("o_orderkey").alias(key),
            F.col("o_orderdate").alias("start"),
            (F.col("o_orderdate") + F.expr(f"INTERVAL {days} DAY")).alias("end"),
        )

    return interval_overlap_join(
        intervals(97, 7, "l_key"), intervals(89, 10, "r_key"), "l_key", "r_key"
    )


@register(
    "join-asof-fwd",
    oracle="""
    WITH l AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type <> 'error'),
    r AS (SELECT user_id, ts AS error_ts, max(event_id) AS error_id
          FROM events WHERE event_type = 'error' AND ts IS NOT NULL
          GROUP BY 1, 2)
    SELECT lnn.event_id, lnn.user_id, r.error_id,
           CAST(floor(epoch(r.error_ts)) AS BIGINT) AS error_epoch
    FROM (SELECT * FROM l WHERE ts IS NOT NULL) lnn
    ASOF LEFT JOIN r
      ON lnn.user_id = r.user_id AND lnn.ts <= r.error_ts
    UNION ALL
    SELECT event_id, user_id, NULL, NULL FROM l WHERE ts IS NULL
    """,
    doc="FORWARD as-of join (merge_asof direction='forward'): every "
    "non-error event joined to the EARLIEST error of the same user at or "
    "after its timestamp — 'time to next failure', the complement of "
    "join-asof2's 'time since last failure'. Same one-exchange union-tag "
    "plan with the window frame flipped (first-ignorenulls over "
    "[CURRENT, UNBOUNDED FOLLOWING]); oracle is DuckDB's native forward "
    "ASOF (ON l.ts <= r.ts).",
)
def join_asof_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from itdb_spark.operators.asof import asof_join

    t = Tables(spark, sf_dir)
    left = t.events.where(F.col("event_type") != "error").select(
        "event_id", "user_id", "ts"
    )
    right = (
        t.events.where(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("error_id"))
        .select("user_id", F.col("ts").alias("error_ts"), "error_id")
    )
    out = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="error_ts",
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        "error_id",
        F.unix_timestamp("error_ts").alias("error_epoch"),
    )


@register(
    "join-nearest",
    oracle="""
    WITH l AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type <> 'error'),
    lnn AS (SELECT * FROM l WHERE ts IS NOT NULL),
    r AS (SELECT user_id, ts AS error_ts, max(event_id) AS error_id
          FROM events WHERE event_type = 'error' AND ts IS NOT NULL
          GROUP BY 1, 2),
    b AS (SELECT lnn.event_id, lnn.user_id, lnn.ts,
                 r.error_id AS b_id, r.error_ts AS b_ts
          FROM lnn ASOF LEFT JOIN r
            ON lnn.user_id = r.user_id AND lnn.ts >= r.error_ts),
    f AS (SELECT lnn.event_id, r.error_id AS f_id, r.error_ts AS f_ts
          FROM lnn ASOF LEFT JOIN r
            ON lnn.user_id = r.user_id AND lnn.ts <= r.error_ts),
    j AS (
      SELECT b.event_id, b.user_id, b.ts, b.b_id, b.b_ts, f.f_id, f.f_ts,
             (b.b_ts IS NULL OR (f.f_ts IS NOT NULL AND
                (epoch_us(f.f_ts) - epoch_us(b.ts))
              < (epoch_us(b.ts) - epoch_us(b.b_ts)))) AS pick_f
      FROM b JOIN f USING (event_id)
    )
    SELECT event_id, user_id,
           CASE WHEN pick_f THEN f_id ELSE b_id END AS error_id,
           CAST(floor(epoch(CASE WHEN pick_f THEN f_ts ELSE b_ts END))
                AS BIGINT) AS error_epoch,
           CASE WHEN (CASE WHEN pick_f THEN f_id ELSE b_id END) IS NULL
                THEN NULL
                WHEN pick_f THEN 'forward' ELSE 'backward' END AS matched_dir
    FROM j
    UNION ALL
    SELECT event_id, user_id, NULL, NULL, NULL
    FROM l WHERE ts IS NULL
    """,
    doc="NEAREST as-of join (merge_asof direction='nearest'): every "
    "non-error event joined to the error of the same user CLOSEST in "
    "absolute time, either side; distance ties resolve backward. "
    "Completes the as-of family (join-asof2 backward, join-asof-fwd "
    "forward). Implementation is STILL one exchange: both window frames "
    "(last-ignorenulls preceding, first-ignorenulls following) share "
    "the single per-user sorted partition — Catalyst inserts no second "
    "Exchange for the second frame — and the winner is a row-local "
    "comparison. The oracle composes DuckDB's native backward AND "
    "forward ASOF joins with the same tie rule — two independent as-of "
    "implementations agreeing on every choice, including the "
    "matched_dir label.",
)
def join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from itdb_spark.operators.asof import asof_join

    t = Tables(spark, sf_dir)
    left = t.events.where(F.col("event_type") != "error").select(
        "event_id", "user_id", "ts"
    )
    right = (
        t.events.where(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("error_id"))
        .select("user_id", F.col("ts").alias("error_ts"), "error_id")
    )
    out = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="error_ts",
        direction="nearest",
    )
    return out.select(
        "event_id",
        "user_id",
        "error_id",
        F.unix_timestamp("error_ts").alias("error_epoch"),
        "matched_dir",
    )


@register(
    "pipe-expectations",
    oracle="""
    SELECT 'orders_pk_unique' AS check_name,
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orders_fk_customer',
           CAST(count(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS
      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem_fk_orders',
           CAST(count(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem_qty_in_1_50',
           CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'documents_text_nonempty',
           CAST(sum(CASE WHEN text IS NULL OR len(trim(text)) = 0
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'events_value_nonnegative',
           CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'events_value_finite',
           CAST(sum(CASE WHEN isnan(value) OR isinf(value)
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'embeddings_dim_consistent',
           CAST(count(DISTINCT len(embedding)) - 1 AS BIGINT)
    FROM embeddings
    """,
    doc="Data-validation expectations report — the constraint gate a "
    "pipeline runs before training consumes a drop (Great-Expectations/"
    "dbt-test shape): PK uniqueness, two FK referential checks (LEFT "
    "ANTI probes — at 100 TB the dim side broadcasts or both sides "
    "shuffle on the key like any join), domain bounds, empty-text and "
    "negative-value counts, embedding-dimension consistency. One row "
    "per check with the exact violation count (not a boolean — the "
    "count IS the triage signal); the whole report is a union of "
    "independent single-pass aggregates, each map-side combined, so "
    "adding checks scales linearly in scans not shuffles.",
)
def pipe_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)

    def row(name: str, agg: DataFrame) -> DataFrame:
        return agg.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("long").alias("n_violations"),
        )

    pk = t.orders.agg(
        (F.count("*") - F.countDistinct("o_orderkey")).alias("n")
    )
    fk_cust = (
        t.orders.join(
            t.customer,
            t.orders["o_custkey"] == t.customer["c_custkey"],
            "left_anti",
        ).agg(F.count("*").alias("n"))
    )
    fk_ord = (
        t.lineitem.join(
            t.orders,
            t.lineitem["l_orderkey"] == t.orders["o_orderkey"],
            "left_anti",
        ).agg(F.count("*").alias("n"))
    )
    qty = t.lineitem.agg(
        F.sum(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1).otherwise(0)
        ).alias("n")
    )
    txt = t.documents.agg(
        F.sum(
            F.when(
                F.col("text").isNull() | (F.length(F.trim("text")) == 0), 1
            ).otherwise(0)
        ).alias("n")
    )
    val = t.events.agg(
        F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).alias("n")
    )
    # finiteness gate for every downstream money path: BOTH engines
    # fail loud (CAST_OVERFLOW / Conversion Error) if a NaN or ±inf
    # double reaches the integer-cents cast — by design (silent NULLing
    # would hide corruption). This check is what a pipeline runs BEFORE
    # those aggregates; see SCALE.md §Ingest.
    fin = t.events.agg(
        F.sum(
            F.when(
                F.isnan("value") | (F.abs("value") == F.lit(float("inf"))), 1
            ).otherwise(0)
        ).alias("n")
    )
    dim = t.embeddings.agg(
        (F.countDistinct(F.size("embedding")) - 1).alias("n")
    )
    return (
        row("orders_pk_unique", pk)
        .unionByName(row("orders_fk_customer", fk_cust))
        .unionByName(row("lineitem_fk_orders", fk_ord))
        .unionByName(row("lineitem_qty_in_1_50", qty))
        .unionByName(row("documents_text_nonempty", txt))
        .unionByName(row("events_value_nonnegative", val))
        .unionByName(row("events_value_finite", fin))
        .unionByName(row("embeddings_dim_consistent", dim))
    )


@register(
    "fn-variant",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(count(*) AS BIGINT) AS n,
           min(json_structure(props)::VARCHAR = '{"k":"UBIGINT"}'
               OR json_structure(props)::VARCHAR = '{"k":"BIGINT"}') AS schema_stable
    FROM events
    GROUP BY event_type
    """,
    doc="Spark 4 VariantType semi-structured path: props parsed ONCE "
    "into the binary Variant encoding (parse_json), typed extraction "
    "via variant_get with a target type — the engine-native successor "
    "to get_json_object string re-parsing (agg-json-max keeps that "
    "classic path for comparison): Variant decodes fields by offset "
    "from the binary form instead of re-tokenizing JSON text per "
    "access, the practical difference at 100 TB of event props. "
    "schema_of_variant pins shape drift as a boolean gate column "
    "(every row OBJECT<k: BIGINT>); the oracle answers with DuckDB's "
    "independent JSON machinery (json_structure).",
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    v = t.events.select(
        "event_type", F.parse_json("props").alias("v")
    ).select(
        "event_type",
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
        (F.expr("schema_of_variant(v)") == "OBJECT<k: BIGINT>").alias("ok"),
    )
    return v.groupBy("event_type").agg(
        F.sum("k").cast("long").alias("sum_k"),
        F.count("*").cast("long").alias("n"),
        F.min("ok").alias("schema_stable"),
    )
