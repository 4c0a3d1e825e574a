"""Analytic value-adds beyond the reference's surface (SURVEY.md notes the
reference predates window functions and has no grouping sets): rollup
subtotals, star-histogram pivot, window frames, ranking family. All free
in Spark/Catalyst — included so a reference user gets the modern forms of
the reports they build by hand today."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from itdb_spark.catalog import Tables
from itdb_spark.functions.core import stars
from itdb_spark.queries import register


@register(
    "agg-rollup",
    oracle="""
    SELECT l_returnflag AS flag, l_linestatus AS status, count(*) AS cnt,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    doc="ROLLUP subtotals over the histogram keys — the reports the "
    "reference assembles with separate per-level queries "
    "(itdb2html.py:264-284 + :386-398) in one pass.",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.rollup(F.col("l_returnflag").alias("flag"), F.col("l_linestatus").alias("status"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("price_cents"),
        )
    )


@register(
    "agg-pivot",
    oracle="""
    SELECT o_orderpriority AS playlist,
           CAST(sum(CASE WHEN stars = 0 THEN 1 ELSE 0 END) AS BIGINT) AS s0,
           CAST(sum(CASE WHEN stars = 1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
           CAST(sum(CASE WHEN stars = 2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
           CAST(sum(CASE WHEN stars = 3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
           CAST(sum(CASE WHEN stars >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS s4plus
    FROM (
      SELECT o.o_orderpriority,
             CAST(floor(coalesce(l.l_quantity, 0) / 20) AS BIGINT) AS stars
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ) GROUP BY 1
    """,
    doc="Star histogram pivoted to columns — the stats-page row shape the "
    "reference renders (stars 0..5 as table columns, itdb2html.py:133-149); "
    "conditional sums rather than .pivot() so the oracle mirrors exactly.",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    joined = t.lineitem.join(t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey).select(
        F.col("o_orderpriority").alias("playlist"), stars("l_quantity").alias("stars")
    )
    buckets = [
        F.sum(F.when(F.col("stars") == i, 1).otherwise(0)).alias(f"s{i}") for i in range(4)
    ] + [F.sum(F.when(F.col("stars") >= 4, 1).otherwise(0)).alias("s4plus")]
    return joined.groupBy("playlist").agg(*buckets)


@register(
    "fn-sample",
    oracle=f"""
    SELECT doc_id, lang FROM documents
    WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
          % 100 < 10
    """,
    doc="Deterministic hash-based sampling: keep rows whose key-hash bucket "
    "falls under the rate — reproducible across engines and runs (unlike "
    "seeded RNG sampling), stable under data reordering, and consistent "
    "across tables sharing the key: the sampling discipline a training-"
    "data pipeline needs for holdout splits.",
)
def fn_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from itdb_spark.functions.core import portable_hash64

    t = Tables(spark, sf_dir)
    return t.documents.where(portable_hash64(F.col("doc_id")) % 100 < 10).select(
        "doc_id", "lang"
    )


@register(
    "snap-isolation",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents WHERE doc_id < 300
    """,
    defer_after=13,
    doc="Snapshot isolation of the versioned-table kernel, graded as a "
    "QUERY rather than asserted in a unit test (round 13): a reader "
    "opened on the published version (sinks/versioned.py::"
    "read_current_chain resolves the manifest and pins the IMMUTABLE "
    "chain dirs at construction) must keep answering from ITS snapshot "
    "even after a writer publishes an append AND a compaction fold "
    "re-points the manifest — the property the atomic-manifest design "
    "buys over rename-swap (which deletes old data under readers). The "
    "query stages documents doc_id < 300 as v1, opens the reader, then "
    "publishes an append (doc_id in [300, 600)) and a compact_chain "
    "fold, and returns the PINNED reader: the oracle is the v1 slice "
    "alone. Both later writes would change the result if any leaked in "
    "(the append adds rows; the fold re-points the manifest at a merged "
    "version) — so a hash match IS the isolation proof. At 100 TB this "
    "is why index refreshes never perturb in-flight probes. Isolation "
    "(proven here) keeps the pinned reader ANSWERING; whether its "
    "files still EXIST is retention policy — vacuum's min_age_s floor "
    "(r14), which sweeps a superseded dir only once it outlives the "
    "longest expected probe.",
)
def snap_isolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from itdb_spark.sinks.versioned import (
        append_version,
        compact_chain,
        read_current_chain,
        write_version,
    )

    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id", "lang", "n_chars")
    work = tempfile.mkdtemp(prefix="itdb_snap_iso_")
    root = os.path.join(work, "table")
    try:
        write_version(docs.where(F.col("doc_id") < 300), root)
        pinned = read_current_chain(spark, root)  # resolves + pins v1
        # a full publish cycle happens UNDER the open reader: an
        # append (new rows, new manifest pointer) and a chain fold
        # (rewritten data, pointer moved again)
        append_version(
            docs.where((F.col("doc_id") >= 300) & (F.col("doc_id") < 600)),
            root,
        )
        compact_chain(spark, root)
        # materialize the PINNED snapshot before the temp dir goes away
        rows = pinned.collect()
        return spark.createDataFrame(rows, pinned.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "snap-retention",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents WHERE doc_id < 300
    """,
    defer_after=14,
    doc="Retention under a pinned reader, graded as a QUERY (round 14, "
    "r13 VERDICT #5's proof half): snap-isolation proves a pinned "
    "reader keeps ANSWERING across append+fold; this proves its FILES "
    "survive vacuum at DEFAULT policy. Same staging (documents "
    "doc_id < 300 as v1, pinned reader, append [300,600), "
    "compact_chain), then ``vacuum(root, keep=1)`` — which without "
    "the min_age_s retention floor (sinks/versioned.py, r14) would "
    "DELETE v1 and v2 out from under the pinned scan (keep=1 retains "
    "only the folded version; the classic Delta VACUUM footgun), and "
    "the query would crash or answer from nothing. The floor retains "
    "superseded dirs younger than the longest expected probe, so the "
    "pinned reader still materializes exactly the v1 slice — the hash "
    "match is the retention proof, the same way snap-isolation's is "
    "the isolation proof. At 100 TB this is why aggressive reclamation "
    "on a live index cannot strand in-flight probes.",
)
def snap_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from itdb_spark.sinks.versioned import (
        append_version,
        compact_chain,
        read_current_chain,
        vacuum,
        write_version,
    )

    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id", "lang", "n_chars")
    work = tempfile.mkdtemp(prefix="itdb_snap_ret_")
    root = os.path.join(work, "table")
    try:
        write_version(docs.where(F.col("doc_id") < 300), root)
        pinned = read_current_chain(spark, root)  # pins v1
        append_version(
            docs.where((F.col("doc_id") >= 300) & (F.col("doc_id") < 600)),
            root,
        )
        compact_chain(spark, root)
        # DEFAULT retention policy: keep=1 would doom both superseded
        # dirs were it not for the min-age floor
        swept = vacuum(root, keep=1)
        if swept:
            raise RuntimeError(
                f"retention floor failed to protect {swept} (all "
                "superseded dirs are seconds old)"
            )
        if not os.path.isdir(os.path.join(root, "v1")):
            raise RuntimeError("pinned reader's v1 files are gone")
        rows = pinned.collect()
        return spark.createDataFrame(rows, pinned.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "snap-fold",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents WHERE doc_id < 800
    """,
    defer_after=14,
    doc="The chain FOLD graded standalone (r13 VERDICT #6): every prior "
    "grade exercised compact_chain inside an ingest loop at one chain "
    "shape; this query's answer is wrong unless the fold preserves "
    "CONTENT and LAYOUT from a multi-link chain. It stages documents "
    "doc_id < 200 as a lang-partitioned base, publishes THREE appends "
    "([200,400), [400,600), [600,800)), folds the 4-link chain via the "
    "shipped policy (maybe_compact_chain at max_links=3), then returns "
    "a FRESH read of the folded table — the oracle is the union slice, "
    "so a hash match proves the fold lost, duplicated, and reordered "
    "nothing. The function additionally raises unless the post-fold "
    "chain is exactly ONE link and the folded dir kept the hive "
    "lang=... layout (sinks/versioned.py::_detect_partition_cols) — "
    "the r12 hazard where a plain rewrite silently dropped partition "
    "pruning. At 100 TB the fold is the LSM maintenance step every "
    "append-chain index relies on; this pins it to an oracle, not "
    "just unit parity.",
)
def snap_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from itdb_spark.sinks.versioned import (
        _detect_partition_cols,
        append_version,
        chain_versions,
        maybe_compact_chain,
        read_current_chain,
        write_version,
    )

    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id", "lang", "n_chars")
    work = tempfile.mkdtemp(prefix="itdb_snap_fold_")
    root = os.path.join(work, "table")
    try:
        write_version(
            docs.where(F.col("doc_id") < 200), root, partition_by=["lang"]
        )
        for lo in (200, 400, 600):
            append_version(
                docs.where(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 200)
                ),
                root,
                partition_by=["lang"],
            )
        assert len(chain_versions(root)) == 4
        stats = maybe_compact_chain(spark, root, max_links=3)
        if stats is None:
            raise RuntimeError("policy did not fold a 4-link chain")
        after = chain_versions(root)
        if len(after) != 1:
            raise RuntimeError(f"fold left a {len(after)}-link chain")
        if _detect_partition_cols(root, after[0]) != ["lang"]:
            raise RuntimeError("fold dropped the hive lang= layout")
        folded = read_current_chain(spark, root).select(
            "doc_id", F.col("lang").cast("string"), "n_chars"
        )
        rows = folded.collect()
        return spark.createDataFrame(rows, folded.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "snap-diff",
    oracle="""
    WITH newt AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 13 = 0 THEN c_acctbal + 1 ELSE c_acctbal END AS c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 97 != 0
      UNION ALL
      SELECT c_custkey + 1000000, c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 89 = 0
    )
    SELECT c_custkey, change FROM (
      SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
             CASE WHEN o.c_custkey IS NULL THEN 'added'
                  WHEN n.c_custkey IS NULL THEN 'removed'
                  WHEN o.c_acctbal IS DISTINCT FROM n.c_acctbal
                       OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment THEN 'changed'
                  ELSE 'unchanged' END AS change
      FROM customer o FULL OUTER JOIN newt n ON o.c_custkey = n.c_custkey
    ) WHERE change != 'unchanged'
    """,
    doc="Snapshot diff / CDC between two table versions: one full-outer "
    "join on the PK classifies every key added/removed/changed "
    "(operators/snapshot.py; generalizes the reference's set-difference "
    "reconciliation and mtime recompute-only-changed, orphaned_files:"
    "101-120, dupes/dedup.py:115-131). The new snapshot is derived "
    "deterministically: drop %97 keys, mutate %13 balances, add %89 "
    "copies under new keys.",
)
def snap_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from itdb_spark.operators.snapshot import snapshot_diff

    t = Tables(spark, sf_dir)
    old = t.customer.select("c_custkey", "c_acctbal", "c_mktsegment")
    new = (
        old.where(F.col("c_custkey") % 97 != 0)
        .withColumn(
            "c_acctbal",
            F.when(F.col("c_custkey") % 13 == 0, F.col("c_acctbal") + 1).otherwise(
                F.col("c_acctbal")
            ),
        )
        .unionByName(
            old.where(F.col("c_custkey") % 89 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                "c_acctbal",
                "c_mktsegment",
            )
        )
    )
    return snapshot_diff(old, new, ["c_custkey"], ["c_acctbal", "c_mktsegment"])


@register(
    "fn-stratified",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % 100
          < CASE c_mktsegment WHEN 'BUILDING' THEN 30
                              WHEN 'MACHINERY' THEN 10
                              ELSE 5 END
    """,
    doc="Stratified deterministic sampling: per-stratum rates (class "
    "rebalancing for training-data curation) on the same portable "
    "key-hash as fn-sample — reproducible across engines/runs/reorderings, "
    "and a pure filter: no shuffle, no RNG state, pushes down to the scan.",
)
def fn_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from itdb_spark.functions.core import portable_hash64

    t = Tables(spark, sf_dir)
    rate = (
        F.when(F.col("c_mktsegment") == "BUILDING", 30)
        .when(F.col("c_mktsegment") == "MACHINERY", 10)
        .otherwise(5)
    )
    return t.customer.where(portable_hash64(F.col("c_custkey")) % 100 < rate).select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "fn-resample",
    oracle="""
    WITH bounds AS (
      SELECT time_bucket(INTERVAL '1 hour', min(ts)) AS t0,
             time_bucket(INTERVAL '1 hour', max(ts)) AS t1
      FROM events
    ),
    timeline AS (
      SELECT unnest(generate_series(t0, t1, INTERVAL '1 hour')) AS hour FROM bounds
    ),
    actual AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS hour, count(*) AS cnt
      FROM events WHERE event_type = 'error' GROUP BY 1
    )
    SELECT CAST(epoch(t.hour) AS BIGINT) AS hour_epoch,
           CAST(coalesce(a.cnt, 0) AS BIGINT) AS cnt
    FROM timeline t LEFT JOIN actual a ON a.hour = t.hour
    """,
    doc="Time-series resample / gap fill: dense hourly timeline via "
    "sequence(), left join the actual hourly counts, zero-fill the gaps — "
    "the reporting shape histograms need when buckets can be empty.",
)
def fn_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    bounds = t.events.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    timeline = bounds.select(
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    actual = (
        t.events.where(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count("*").alias("cnt"))
    )
    return timeline.join(actual, "hour", "left").select(
        F.unix_timestamp("hour").alias("hour_epoch"),
        F.coalesce("cnt", F.lit(0)).alias("cnt"),
    )


@register(
    "win-frame",
    oracle="""
    SELECT custkey, orderkey, price_cents,
           CAST(sum(price_cents) OVER (
             PARTITION BY custkey ORDER BY orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling3_cents
    FROM (
      SELECT o_custkey AS custkey, o_orderkey AS orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
      FROM orders
    )
    """,
    doc="Explicit window frame (ROWS BETWEEN): rolling 3-order spend per "
    "customer — frame specs are absent from the reference (§2.5) but free "
    "here.",
)
def win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    base = t.orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    w = Window.partitionBy("custkey").orderBy("orderkey").rowsBetween(-2, 0)
    return base.select(
        "custkey", "orderkey", "price_cents", F.sum("price_cents").over(w).alias("rolling3_cents")
    )


@register(
    "win-rank",
    oracle="""
    SELECT priority, orderkey,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile
    FROM (
      SELECT o_orderpriority AS priority, o_orderkey AS orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
      FROM orders
    )
    WINDOW w AS (PARTITION BY priority ORDER BY price_cents DESC, orderkey)
    """,
    doc="Ranking family (rank/dense_rank/ntile) — no ranking exists in the "
    "reference (§2.5); full tie-break (price, orderkey) keeps ntile "
    "deterministic.",
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    base = t.orders.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderkey").alias("orderkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    w = Window.partitionBy("priority").orderBy(F.desc("price_cents"), F.asc("orderkey"))
    return base.select(
        "priority",
        "orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "fn-embed-norm",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_dot_product(vec, vec)), 6) AS l2,
           round(vec[1] / sqrt(list_dot_product(vec, vec)), 6) AS first_norm
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings)
    """,
    doc="Embedding L2 normalization — the preprocessing step every "
    "cosine-similarity pipeline applies once at ingest so downstream "
    "scoring is a plain dot product: per-row norm via F.aggregate over "
    "the array (JVM-side fold, same left-to-right order as DuckDB's "
    "list_dot_product → bit-stable before the round), normalized first "
    "component as the spot check. Narrow, no shuffle, whole column "
    "pipelined.",
)
def fn_embed_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    vec = F.col("embedding").cast("array<double>")
    sumsq = F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x)
    norm = F.sqrt(sumsq)
    # try_divide: a ZERO (dead) embedding has no direction — first_norm
    # is NULL, exactly DuckDB's x/0.0 → NULL. A plain division CRASHES
    # the whole job under ANSI mode on the first dead embedding (caught
    # by the edge corpus's zero vector).
    return t.embeddings.select(
        "vec_id",
        F.round(norm, 6).alias("l2"),
        F.round(F.try_divide(vec.getItem(0), norm), 6).alias("first_norm"),
    )


@register(
    "agg-skewcheck",
    oracle="""
    SELECT CAST(max(c) AS BIGINT) AS max_cnt, CAST(min(c) AS BIGINT) AS min_cnt,
           CAST(count(*) AS BIGINT) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(min(k) FILTER (WHERE c = (SELECT max(c) FROM
             (SELECT l_partkey AS k, count(*) AS c FROM lineitem GROUP BY 1)))
             AS BIGINT) AS hottest_key
    FROM (SELECT l_partkey AS k, count(*) AS c FROM lineitem GROUP BY 1)
    """,
    doc="Join-key skew pre-flight — the diagnosis run BEFORE a big "
    "shuffle join to decide between plain hash join, AQE skew split, and "
    "explicit salting (operators/skew.py): per-key counts in one "
    "map-side-combined shuffle, then a single global aggregate for "
    "max/min/sum and the hottest key — the argmax rides along as a "
    "struct-max ((count, -key): min-id tie-break), so there is NO global "
    "window and NO single-partition pass over the key table. At 100 TB "
    "this one cheap pass is the difference between a straggler-free join "
    "and a 10-hour tail task.",
)
def agg_skewcheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    per_key = t.lineitem.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count("*").alias("c")
    )
    top = F.max(F.struct(F.col("c").alias("c"), (-F.col("k")).alias("nk"))).alias("t")
    stats = per_key.agg(
        F.max("c").cast("long").alias("max_cnt"),
        F.min("c").cast("long").alias("min_cnt"),
        F.count("*").cast("long").alias("n_keys"),
        F.sum("c").cast("long").alias("n_rows"),
        top,
    )
    return stats.select(
        "max_cnt",
        "min_cnt",
        "n_keys",
        "n_rows",
        (-F.col("t.nk")).cast("long").alias("hottest_key"),
    )


@register(
    "fn-quantize",
    oracle="""
    SELECT vec_id,
           round(s, 6) AS scale6,
           CAST(CASE WHEN s = 0 THEN 0 ELSE q[1] END AS BIGINT) AS q_first,
           CAST(CASE WHEN s = 0 THEN 0
                     ELSE list_sum(list_transform(q, x -> abs(x))) END AS BIGINT)
             AS q_l1,
           (s = 0 OR list_aggregate(
              list_transform(range(1, len(vec) + 1),
                             i -> abs(vec[i] - q[i] * s)), 'max') <= s * 0.5 + 1e-9)
             AS err_ok
    FROM (
      SELECT vec_id, vec, s,
             list_transform(vec, x ->
               least(127, greatest(-127,
                 CAST(floor(CASE WHEN s = 0 THEN 0 ELSE x / s END + 0.5) AS BIGINT)))) AS q
      FROM (
        SELECT vec_id, vec,
               list_aggregate(list_transform(vec, x -> abs(x)), 'max') / 127.0 AS s
        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings)
      )
    )
    """,
    doc="Symmetric per-vector int8 quantization — the storage/bandwidth "
    "step before ANN at scale (4x smaller vectors, int8 dot products): "
    "scale = max|x|/127, q = floor(x/scale + 0.5) clamped to [-127,127] "
    "(floor(+0.5) instead of round() so both engines evaluate the "
    "identical IEEE expression — no round-half-mode divergence). Emits "
    "the quantized L1 checksum (whole-vector integer parity), first "
    "component, and an err_ok bound check (max reconstruction error <= "
    "scale/2) the oracle expects all-true. Narrow per-row array fold, "
    "no shuffle, no UDF.",
)
def fn_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    base = t.embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    ).select(
        "vec_id",
        "vec",
        (F.array_max(F.transform("vec", lambda x: F.abs(x))) / 127.0).alias("s"),
    )
    zero = F.col("s") == 0
    q = F.transform(
        "vec",
        lambda x: F.least(
            F.lit(127),
            F.greatest(
                F.lit(-127),
                F.floor(F.when(zero, F.lit(0.0)).otherwise(x / F.col("s")) + 0.5).cast(
                    "long"
                ),
            ),
        ),
    )
    qd = base.select("vec_id", "vec", "s", q.alias("q"))
    err_max = F.array_max(
        F.zip_with("vec", "q", lambda x, qq: F.abs(x - qq * F.col("s")))
    )
    return qd.select(
        "vec_id",
        F.round("s", 6).alias("scale6"),
        F.when(zero, F.lit(0)).otherwise(F.element_at("q", 1)).cast("long").alias("q_first"),
        F.when(zero, F.lit(0))
        .otherwise(F.aggregate("q", F.lit(0).cast("long"), lambda acc, x: acc + F.abs(x)))
        .cast("long")
        .alias("q_l1"),
        (zero | (err_max <= F.col("s") * 0.5 + 1e-9)).alias("err_ok"),
    )


@register(
    "agg-cube",
    oracle="""
    SELECT l_returnflag AS flag, o_orderpriority AS priority,
           count(*) AS cnt,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY CUBE(l_returnflag, o_orderpriority)
    """,
    doc="CUBE over a joined fact — all four grouping combinations "
    "(flag×priority, flag, priority, grand total) in ONE shuffle via "
    "Spark's Expand (each input row fans out per grouping set, partials "
    "map-side combined), completing the rollup/pivot/cube grouping-sets "
    "family. The reference assembles such reports with one query per "
    "level (itdb2html.py:264-284, :386-398).",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    joined = t.lineitem.join(
        t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey
    )
    return joined.cube(
        F.col("l_returnflag").alias("flag"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(
        F.count("*").alias("cnt"),
        F.sum(F.round(F.col("l_quantity")).cast("long")).alias("total_qty"),
    )


@register(
    "fn-shuffle",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(concat('shuf42:', doc_id)), 1, 15))
                  AS BIGINT) AS h
      FROM documents
    )
    SELECT doc_id, h, CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) AS pos
    FROM h
    """,
    doc="Deterministic global training shuffle: every doc gets a "
    "pseudo-random position — rank under the portable hash of "
    "(seed, doc_id). The standard pre-training epoch order: reproducible "
    "across engines/runs/partitionings (same property as fn-sample's "
    "hash holdout), resumable mid-epoch by position, and re-seedable per "
    "epoch. Positions come from the bucketed ranged_row_number plan "
    "(plans/library.py): hash-prefix buckets → per-bucket row_number → "
    "broadcast boundary offsets — NO single-partition global window at "
    "any width; the oracle is the plain global-window rank.",
)
def fn_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from itdb_spark.functions.core import portable_hash64
    from itdb_spark.plans.library import ranged_row_number

    t = Tables(spark, sf_dir)
    hashed = t.documents.select(
        "doc_id",
        portable_hash64(F.concat(F.lit("shuf42:"), F.col("doc_id"))).alias("h"),
    )
    # bucket = top bits of the 60-bit hash: monotone in the leading order
    # column (the order-consistency contract), ~64 buckets at any SF
    numbered = ranged_row_number(
        hashed,
        ["h", "doc_id"],
        start=0,
        out_col="pos",
        bucket=F.floor(F.col("h") / F.lit(1 << 54)),
    )
    return numbered.select("doc_id", "h", "pos")


@register(
    "agg-quantile",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n,
           quantile_cont(n_chars, 0.25) AS p25,
           quantile_cont(n_chars, 0.5)  AS p50,
           quantile_cont(n_chars, 0.75) AS p75,
           quantile_cont(n_chars, 0.95) AS p95
    FROM documents
    GROUP BY lang
    """,
    doc="Exact grouped percentiles of document length — the length-"
    "distribution profile a curation pass thresholds against (reference "
    "profiles distributions with full-table Python loops, "
    "itdb2html.py:264-284; here one partial-aggregated groupBy). Exact "
    "`percentile` (R-7 linear interpolation) rather than approx so the "
    "DuckDB quantile_cont twin matches bit-for-bit on integer inputs; "
    "the approx/sketch form for 100 TB is agg-approx's "
    "percentile_approx, already registered — this is its exactness "
    "baseline, the same pairing as sim-knn-brute vs sim-knn-lsh.",
)
def agg_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    docs = t.documents
    return docs.groupBy("lang").agg(
        F.count("*").cast("long").alias("n"),
        F.percentile("n_chars", 0.25).alias("p25"),
        F.percentile("n_chars", 0.5).alias("p50"),
        F.percentile("n_chars", 0.75).alias("p75"),
        F.percentile("n_chars", 0.95).alias("p95"),
    )


@register(
    "agg-funnel",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, event_type FROM events
      WHERE event_type IN ('view', 'click', 'purchase') AND ts IS NOT NULL
    ), t1 AS (
      SELECT user_id, min(ts) AS t_view FROM ev
      WHERE event_type = 'view' GROUP BY 1
    ), t2 AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM ev e JOIN t1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > t1.t_view
      GROUP BY 1
    ), t3 AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM ev e JOIN t2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > t2.t_click
      GROUP BY 1
    ), u AS (SELECT DISTINCT user_id FROM ev)
    SELECT u.user_id, t1.t_view, t2.t_click, t3.t_purchase,
           CAST(CASE WHEN t3.user_id IS NOT NULL THEN 3
                     WHEN t2.user_id IS NOT NULL THEN 2
                     WHEN t1.user_id IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS stage
    FROM u LEFT JOIN t1 USING (user_id)
           LEFT JOIN t2 USING (user_id)
           LEFT JOIN t3 USING (user_id)
    """,
    doc="Sequential conversion funnel over the event stream: per user, "
    "first 'view', first 'click' STRICTLY after that view, first "
    "'purchase' strictly after that click — the ordered-subsequence "
    "semantics a naive per-type min() gets wrong (a purchase before the "
    "click must not count). One shuffle: groupBy(user) collects the "
    "sorted (ts, type) array and the three stage timestamps fall out of "
    "per-row filter/element_at folds, bounded by each user's own event "
    "count (a bot user with millions of events is the skew case — cap "
    "or pre-filter by event_type IN (...) as here, which also prunes "
    "the collected array). NULL-ts events are defined OUT of the funnel "
    "(an unordered event can't anchor a sequence) by an identical "
    "pre-filter on both sides — without it the three forms three-way "
    "diverge on a NULL-ts 'view' (oracle stage 1 via the grouped-NULL "
    "min, batch Spark stage 0, streaming sentinel-chains). The oracle "
    "takes the chained-join form — a genuinely different plan computing "
    "the same answer.",
)
def agg_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.where(
        F.col("event_type").isin("view", "click", "purchase")
        & F.col("ts").isNotNull()
    ).select("user_id", "ts", "event_type")
    g = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "event_type"))).alias("a")
    )
    return (
        g.withColumn(
            "t_view",
            F.expr("try_element_at(filter(a, x -> x.event_type = 'view'), 1).ts"),
        )
        .withColumn(
            "t_click",
            F.expr(
                "try_element_at(filter(a, x -> x.event_type = 'click'"
                " AND x.ts > t_view), 1).ts"
            ),
        )
        .withColumn(
            "t_purchase",
            F.expr(
                "try_element_at(filter(a, x -> x.event_type = 'purchase'"
                " AND x.ts > t_click), 1).ts"
            ),
        )
        .select(
            "user_id",
            # NULL-key rule (same as the streaming twin and the oracle's
            # LEFT JOIN USING, which never equality-matches NULL): the
            # NULL-user group reports stage 0 with all-NULL timestamps —
            # groupBy happily folds the NULL group, so guard explicitly.
            *[
                F.when(F.col("user_id").isNotNull(), F.col(c)).alias(c)
                for c in ("t_view", "t_click", "t_purchase")
            ],
            F.when(F.col("user_id").isNull(), 0)
            .when(F.col("t_purchase").isNotNull(), 3)
            .when(F.col("t_click").isNotNull(), 2)
            .when(F.col("t_view").isNotNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("stage"),
        )
    )


@register(
    "fn-zorder",
    oracle="""
    SELECT orderkey, custkey_lo, days_lo,
           CAST(list_sum(list_transform(range(0, 16), i ->
             ((custkey_lo >> i) & 1) * power(2, 2 * i)
             + ((days_lo >> i) & 1) * power(2, 2 * i + 1))) AS BIGINT) AS z
    FROM (
      SELECT o_orderkey AS orderkey,
             o_custkey % 65536 AS custkey_lo,
             CAST(epoch(o_orderdate) / 86400 AS BIGINT) % 65536 AS days_lo
      FROM orders
    )
    """,
    doc="Z-order clustering key — the multi-dimensional data-layout "
    "technique (Delta ZORDER BY / Iceberg sort orders): interleave the "
    "low 16 bits of (customer, order-day) so writing sorted by z keeps "
    "rows close in BOTH dimensions within the same files, and min/max "
    "row-group stats prune scans filtered on either column. The "
    "interleave is a pure integer bit fold (no UDF), exact in both "
    "engines; at 100 TB the use is sortWithinPartitions(z) before the "
    "parquet write — the key computation shown here is the whole "
    "engine-side cost. Bijectivity on the 32-bit domain is "
    "property-tested (interleave → deinterleave roundtrip).",
)
def fn_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    base = t.orders.select(
        F.col("o_orderkey").alias("orderkey"),
        (F.col("o_custkey") % 65536).alias("custkey_lo"),
        (
            (F.unix_timestamp(F.col("o_orderdate").cast("timestamp")) / 86400)
            .cast("long") % 65536
        ).alias("days_lo"),
    )
    # shiftleft/shiftright take a literal bit count, not a Column — the
    # fold is an expr so the lambda's i can drive the shifts
    z = F.expr(
        "aggregate(sequence(0, 15), 0L, (acc, i) -> acc"
        " + CAST(((custkey_lo div CAST(pow(2, i) AS BIGINT)) % 2)"
        "        * CAST(pow(2, 2 * i) AS BIGINT) AS BIGINT)"
        " + CAST(((days_lo div CAST(pow(2, i) AS BIGINT)) % 2)"
        "        * CAST(pow(2, 2 * i + 1) AS BIGINT) AS BIGINT))"
    )
    return base.select("orderkey", "custkey_lo", "days_lo", z.alias("z"))


@register(
    "agg-cohort",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(floor(floor(epoch(min(ts))) / 604800) AS BIGINT) AS cohort_week
      FROM events GROUP BY 1
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(floor(floor(epoch(e.ts)) / 604800) AS BIGINT) - f.cohort_week
               AS week_offset
      FROM events e JOIN firsts f USING (user_id)
    )
    SELECT cohort_week, week_offset,
           CAST(count(*) AS BIGINT) AS active_users
    FROM activity GROUP BY 1, 2
    """,
    doc="Cohort retention over the event stream — the canonical "
    "product-analytics rollup: users cohort by their first-ever event "
    "week (epoch-week integer arithmetic, no timezone edges), and each "
    "(cohort, week-offset) cell counts users active that many weeks "
    "later. Two map-side-combined shuffles (first-event min per user, "
    "then the distinct activity cell count); the firsts table is "
    "user-cardinality and broadcastable against the fact stream at "
    "warehouse scale. week_offset 0 row per cohort doubles as the "
    "cohort size, so retention ratios are a window division away.",
)
def agg_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    week = lambda c: F.floor(F.unix_timestamp(c) / 604800).cast("long")
    firsts = t.events.groupBy("user_id").agg(
        week(F.min("ts")).alias("cohort_week")
    )
    activity = (
        t.events.select("user_id", week(F.col("ts")).alias("wk"))
        .join(firsts, "user_id")
        .select(
            "user_id", "cohort_week",
            (F.col("wk") - F.col("cohort_week")).alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count("*").cast("long").alias("active_users")
    )


@register(
    "agg-sessionize",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s FROM events
      WHERE ts IS NOT NULL
    ), marked AS (
      SELECT user_id, s,
             CASE WHEN s - lag(s) OVER (PARTITION BY user_id ORDER BY s)
                       > 1800
                  OR lag(s) OVER (PARTITION BY user_id ORDER BY s) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM e
    ), sessioned AS (
      SELECT user_id, s,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked
    ), sessions AS (
      SELECT user_id, sid, count(*) AS n_events,
             max(s) - min(s) AS span_s
      FROM sessioned GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS total_events,
           CAST(max(n_events) AS BIGINT) AS max_session_events,
           CAST(sum(span_s) AS BIGINT) AS total_active_s
    FROM sessions GROUP BY 1
    """,
    doc="Batch sessionization by 30-minute inactivity gap — the "
    "gaps-and-islands WINDOW mechanism, deliberately distinct from "
    "stream-session's session_window aggregate: lag marks session "
    "starts, a running sum assigns session ids, two grouped rollups "
    "produce per-user session stats. Everything is integer epoch "
    "seconds; equal-timestamp ties cannot flip any session boundary "
    "(gap 0 never splits), so the result is order-deterministic without "
    "tie-break columns. NULL-ts events are defined out (an unplaceable "
    "event can't sit in a session; also Spark orders NULLS FIRST where "
    "DuckDB orders NULLS LAST — the session count would depend on the "
    "engine's NULL sort side). One exchange on user_id serves the lag "
    "window, the running sum, AND both aggregations (same key prefix).",
)
def agg_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    e = t.events.where(F.col("ts").isNotNull()).select(
        "user_id", F.unix_timestamp("ts").cast("long").alias("s")
    )
    w = Window.partitionBy("user_id").orderBy("s")
    marked = e.withColumn(
        "new_session",
        F.when(
            F.lag("s").over(w).isNull()
            | ((F.col("s") - F.lag("s").over(w)) > 1800),
            1,
        ).otherwise(0),
    )
    sessioned = marked.withColumn(
        "sid", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    sessions = sessioned.groupBy("user_id", "sid").agg(
        F.count("*").alias("n_events"),
        (F.max("s") - F.min("s")).alias("span_s"),
    )
    return sessions.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.sum("n_events").cast("long").alias("total_events"),
        F.max("n_events").cast("long").alias("max_session_events"),
        F.sum("span_s").cast("long").alias("total_active_s"),
    )


@register(
    "fn-interleave",
    oracle="""
    WITH r AS (
      SELECT doc_id, source,
             CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY CAST(concat('0x', substr(md5(concat('il7:', doc_id)),
                                    1, 15)) AS BIGINT), doc_id
             ) AS BIGINT) AS rn
      FROM documents
    )
    SELECT doc_id, source, rn,
           CAST(row_number() OVER (ORDER BY rn, source, doc_id) AS BIGINT)
             AS pos
    FROM r
    """,
    doc="Proportional source interleave — the training order that avoids "
    "source clumping (a plain shuffle can emit long single-source runs; "
    "interleaving guarantees every source appears once per round-robin "
    "cycle while position within a source stays hash-random): rank docs "
    "WITHIN each source by seeded hash (partitioned window — no global "
    "anything), then order globally by (rank, source) via the bucketed "
    "ranged_row_number plan, bucketing on the leading rank column so no "
    "single-partition window exists at any width. Complements "
    "fn-shuffle (pure random order) and pipe-assemble (quota "
    "selection); the oracle is the plain two-window SQL.",
)
def fn_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    from itdb_spark.functions.core import portable_hash64
    from itdb_spark.plans.library import ranged_row_number

    t = Tables(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(
        portable_hash64(F.concat(F.lit("il7:"), F.col("doc_id"))), "doc_id"
    )
    ranked = t.documents.select(
        "doc_id", "source", F.row_number().over(w).cast("long").alias("rn")
    )
    # rn is small-integer and heavily tied (one per source per value) —
    # bucket on it directly; order-consistency holds since rn leads
    return ranged_row_number(
        ranked,
        ["rn", "source", "doc_id"],
        start=0,  # start is an OFFSET on the 1-based rank
        out_col="pos",
        bucket=F.floor(F.col("rn") / 64),
    ).select("doc_id", "source", "rn", "pos")


@register(
    "win-dist",
    oracle="""
    SELECT priority, orderkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           CAST(ntile(10) OVER (PARTITION BY priority
                                ORDER BY price_cents DESC, orderkey)
                AS BIGINT) AS decile
    FROM (
      SELECT o_orderpriority AS priority, o_orderkey AS orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
      FROM orders
    )
    WINDOW w AS (PARTITION BY priority ORDER BY price_cents DESC)
    """,
    doc="Distribution window family (percent_rank / cume_dist / ntile "
    "deciles) completing win-rank's ranking set: percent_rank and "
    "cume_dist depend only on the VALUE ordering (ties share a value, "
    "so no tie-break is needed for determinism — both engines compute "
    "(rank-1)/(n-1) and peers/n over identical integer cents), while "
    "ntile assigns rows and therefore keeps the full (price, orderkey) "
    "tie-break. The rounded ratios are quotients of small integers — "
    "identical doubles in both engines, one rounding, no sum-order "
    "exposure.",
)
def win_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    base = t.orders.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderkey").alias("orderkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    wv = Window.partitionBy("priority").orderBy(F.desc("price_cents"))
    wt = Window.partitionBy("priority").orderBy(
        F.desc("price_cents"), F.asc("orderkey")
    )
    return base.select(
        "priority",
        "orderkey",
        F.round(F.percent_rank().over(wv), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(wv), 6).alias("cume"),
        F.ntile(10).over(wt).cast("long").alias("decile"),
    )


@register(
    "fn-sample-pps",
    oracle="""
    WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w FROM documents),
    c AS (
      SELECT doc_id, w,
             CAST(coalesce(sum(w) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cb
      FROM d
    ),
    t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM d)
    SELECT doc_id, w, cb,
           CAST(
             (CASE WHEN 200 * (cb + w) <= tw THEN 0
                   ELSE LEAST(100, (200 * (cb + w) + tw - 1) // (2 * tw)) END)
             - (CASE WHEN 200 * cb <= tw THEN 0
                     ELSE LEAST(100, (200 * cb + tw - 1) // (2 * tw)) END)
           AS BIGINT) AS n_hits
    FROM c, t
    WHERE (CASE WHEN 200 * (cb + w) <= tw THEN 0
                ELSE LEAST(100, (200 * (cb + w) + tw - 1) // (2 * tw)) END)
          - (CASE WHEN 200 * cb <= tw THEN 0
                  ELSE LEAST(100, (200 * cb + tw - 1) // (2 * tw)) END) >= 1
    """,
    doc="Systematic probability-proportional-to-size (PPS) sampling: k=100 "
    "evenly spaced offsets over the cumulative weight line (midpoint rule "
    "o_j = (2j+1)·W/(2k)); a document is drawn with multiplicity = how "
    "many offsets land in its [cum_before, cum_before + w) interval, so "
    "inclusion probability is exactly proportional to weight (n_chars "
    "here; token count or quality in deployment) and hit counts telescope "
    "to exactly k. ALL-INTEGER arithmetic — no RNG, no float pow: unlike "
    "Efraimidis-Spirakis u^(1/w) keys, the selection is bit-reproducible "
    "across engines and immune to float-tie flips, which is what lets "
    "the hash gate pin it. The cumulative line comes from the two-phase "
    "ranged_cumsum (per-bucket window + broadcast bucket offsets — NO "
    "single-partition exchange); the total weight is one scalar agg "
    "broadcast back. The weighted companion to fn-sample's Bernoulli "
    "hash-split and fn-stratified's per-group quotas.",
)
def fn_sample_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from itdb_spark.plans.library import ranged_cumsum

    k2, k = 200, 100  # 2k, k
    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id", F.col("n_chars").cast("long").alias("w"))
    cum = ranged_cumsum(
        docs, ["doc_id"], "w", out_col="cb", bucket=F.floor(F.col("doc_id") / 100)
    ).select("doc_id", "w", F.col("cb").cast("long").alias("cb"))
    tot = docs.agg(F.sum("w").cast("long").alias("tw"))

    def f_at(x: str) -> str:
        return (
            f"CASE WHEN {k2} * ({x}) <= tw THEN 0 "
            f"ELSE LEAST({k}, ({k2} * ({x}) + tw - 1) DIV (2 * tw)) END"
        )

    n_hits = f"CAST(({f_at('cb + w')}) - ({f_at('cb')}) AS BIGINT)"
    return (
        cum.crossJoin(F.broadcast(tot))
        .withColumn("n_hits", F.expr(n_hits))
        .where(F.col("n_hits") >= 1)
        .select("doc_id", "w", "cb", "n_hits")
    )


@register(
    "fn-chunk-overlap",
    oracle="""
    WITH tk AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
      FROM documents
    ),
    geom AS (
      SELECT doc_id, t, len(t) AS n,
             CASE WHEN len(t) <= 64 THEN 1
                  ELSE 1 + (len(t) - 64 + 48 - 1) // 48 END AS n_chunks
      FROM tk
    )
    SELECT doc_id,
           CAST(idx AS BIGINT) AS chunk_idx,
           CAST(idx * 48 AS BIGINT) AS start,
           CAST(least(64, n - idx * 48) AS BIGINT) AS chunk_len,
           array_to_string(t[idx * 48 + 1 : idx * 48 + least(64, n - idx * 48)],
                           ' ') AS chunk_text
    FROM geom, unnest(range(0, n_chunks)) AS u(idx)
    """,
    doc="Overlapping chunk manifests (size 64 tokens, stride 48 — 25% "
    "overlap): the RAG / context-window shape, complementary to "
    "fn-pack-chunks' budget-aligned DISJOINT splits and dedup-chunks' "
    "content-defined chunks. Chunk count is closed-form integer "
    "geometry (1 + ceil((n-size)/stride), short docs one chunk), the "
    "fan-out per doc is bounded by its own length, and the chunk TEXT "
    "is emitted from a per-row array slice — no self-join, no shuffle "
    "at all beyond the scan (the whole query is a generator expression "
    "over each row). Raw-split token semantics shared with text-winnow "
    "(empty doc → one ''-token chunk, engine-identical).",
)
def fn_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    size, stride = 64, 48
    t = Tables(spark, sf_dir)
    geom = t.documents.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    ).select(
        "doc_id",
        "t",
        F.size("t").alias("n"),
        F.when(F.size("t") <= size, F.lit(1))
        .otherwise(1 + F.expr(f"(size(t) - {size} + {stride} - 1) DIV {stride}"))
        .alias("n_chunks"),
    )
    return geom.select(
        "doc_id",
        "n",
        "t",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("idx"),
    ).select(
        "doc_id",
        F.col("idx").cast("long").alias("chunk_idx"),
        (F.col("idx") * stride).cast("long").alias("start"),
        F.least(F.lit(size), F.col("n") - F.col("idx") * stride)
        .cast("long")
        .alias("chunk_len"),
        F.array_join(
            F.slice(
                F.col("t"),
                F.col("idx") * stride + 1,
                F.least(F.lit(size), F.col("n") - F.col("idx") * stride),
            ),
            " ",
        ).alias("chunk_text"),
    )


@register(
    "agg-linreg",
    oracle="""
    WITH d AS (
      SELECT source,
             CAST(n_chars AS BIGINT) AS x,
             CAST(CASE WHEN len(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
                  AS BIGINT) AS y
      FROM documents
    ),
    m AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM d GROUP BY source
    )
    SELECT source, n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
           round((CAST(sy AS DOUBLE)
                  - (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE), 6) AS intercept,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r
    FROM m
    """,
    doc="Per-source OLS regression + Pearson r of token count on "
    "n_chars — the drift/sanity statistic a dataset card carries — via "
    "the EXACT-MOMENTS discipline: the five sufficient statistics "
    "(Σx, Σy, Σx², Σy², Σxy) are INTEGER sums (one map-side-combined "
    "groupBy; exact in any aggregation order, unlike a float corr() "
    "whose summation order differs between engines), and only the "
    "closed-form division/sqrt at the end touches floats — identical "
    "doubles from identical integers, so the gate pins the statistics "
    "bit-for-bit where built-in corr()/regr_slope() could not. "
    "Sufficient statistics ARE the distributed-merge form: partial "
    "moment vectors add, which is also how this runs over 100 TB or "
    "as a streaming aggregate.",
)
def agg_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    toks = F.when(
        F.length(F.trim("text")) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(F.col("text")), r"\s+")))
    d = t.documents.select(
        "source",
        F.col("n_chars").cast("long").alias("x"),
        toks.cast("long").alias("y"),
    )
    m = d.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov.cast("double") / varx.cast("double")
    return m.select(
        "source",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double"),
            6,
        ).alias("intercept"),
        F.round(
            cov.cast("double")
            / F.sqrt(varx.cast("double") * vary.cast("double")),
            6,
        ).alias("r"),
    )


@register(
    "agg-chi2",
    oracle="""
    WITH o AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS obs
      FROM documents GROUP BY 1, 2
    ),
    rt AS (SELECT source, sum(obs) AS r FROM o GROUP BY 1),
    ct AS (SELECT lang, sum(obs) AS c FROM o GROUP BY 1),
    tot AS (SELECT sum(obs) AS n FROM o),
    cells AS (
      SELECT o.source, o.lang, o.obs,
             CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE) / CAST(tot.n AS DOUBLE)
               AS exp
      FROM o JOIN rt USING (source) JOIN ct USING (lang), tot
    ),
    folded AS (
      SELECT list_sum(list_transform(
               list((obs, exp) ORDER BY source, lang),
               t -> (CAST(t[1] AS DOUBLE) - t[2]) * (CAST(t[1] AS DOUBLE) - t[2])
                    / t[2])) AS chi2,
             count(*) AS cells
      FROM cells
    )
    SELECT CAST((SELECT count(DISTINCT source) FROM documents) AS BIGINT)
             AS n_sources,
           CAST((SELECT count(DISTINCT lang) FROM documents) AS BIGINT) AS n_langs,
           CAST(cells AS BIGINT) AS n_cells,
           round(chi2, 6) AS chi2
    FROM folded
    """,
    doc="Chi-square independence test of source x lang — the "
    "contamination/imbalance diagnostic for a corpus card: observed "
    "cell counts are exact integers from one map-side-combined "
    "groupBy; expected counts are doubles computed from exact integer "
    "marginals (identical on both engines); and the one genuinely "
    "order-sensitive float reduction — the sum over cells — folds in "
    "DETERMINISTIC (source, lang)-sorted order on both sides "
    "(text-entropy's discipline), so the statistic hash-gates. The "
    "contingency table is |sources| x |langs| rows — driver-scale at "
    "any corpus size; everything upstream is the counts shuffle.",
)
def agg_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    o = t.documents.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("obs")
    )
    rt = o.groupBy("source").agg(F.sum("obs").alias("r"))
    ct = o.groupBy("lang").agg(F.sum("obs").alias("c"))
    tot = o.agg(F.sum("obs").alias("n"))
    cells = (
        o.join(rt, "source")
        .join(ct, "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "lang",
            "obs",
            (
                F.col("r").cast("double")
                * F.col("c").cast("double")
                / F.col("n").cast("double")
            ).alias("exp"),
        )
    )
    folded = cells.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", "lang", "obs", "exp"))),
            F.lit(0.0),
            # (o-e)*(o-e), not **2: Math.pow is 1-ulp-approximate while
            # the oracle's explicit multiply is correctly rounded
            lambda acc, t: acc
            + (t.getField("obs").cast("double") - t.getField("exp"))
            * (t.getField("obs").cast("double") - t.getField("exp"))
            / t.getField("exp"),
        ).alias("chi2"),
        F.count("*").cast("long").alias("n_cells"),
    )
    dims = t.documents.agg(
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
    )
    return dims.crossJoin(folded).select(
        "n_sources", "n_langs", "n_cells", F.round("chi2", 6).alias("chi2")
    )


@register(
    "agg-gini",
    oracle="""
    WITH ranked AS (
      SELECT source, CAST(n_chars AS BIGINT) AS x,
             CAST(row_number() OVER (PARTITION BY source
                                     ORDER BY n_chars, doc_id) AS BIGINT) AS rn
      FROM documents
    ),
    agg AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS t,
             CAST(sum(rn * x) AS BIGINT) AS s
      FROM ranked GROUP BY source
    )
    SELECT source, n,
           CAST((1000 * (2 * s - (n + 1) * t)) // (n * t) AS BIGINT)
             AS gini_milli
    FROM agg
    """,
    doc="Gini coefficient of document length per source — the "
    "concentration diagnostic next to agg-chi2's independence test "
    "(a source where a few giant documents carry most tokens trains "
    "differently from a uniform one): G = (2*sum(i*x_(i)) - (n+1)*sum(x)) "
    "/ (n*sum(x)) over rank-sorted lengths, ENTIRELY in integers "
    "(rank-weighted sums are exact; one DIV at the end emits "
    "milli-units) — rank ties don't perturb the sum since equal x "
    "swap freely between adjacent ranks. One per-source window for "
    "ranks (partitioned sort, no global order) + one map-side-combined "
    "groupBy.",
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = t.documents.select(
        "source",
        F.col("n_chars").cast("long").alias("x"),
        F.row_number().over(w).cast("long").alias("rn"),
    )
    agg = ranked.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("t"),
        F.sum(F.col("rn") * F.col("x")).cast("long").alias("s"),
    )
    return agg.select(
        "source",
        "n",
        F.expr("CAST((1000 * (2 * s - (n + 1) * t)) DIV (n * t) AS BIGINT)").alias(
            "gini_milli"
        ),
    )


@register(
    "agg-abtest",
    oracle="""
    WITH cents AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
      FROM events
      WHERE event_type IN ('view', 'click') AND value IS NOT NULL
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s,
             CAST(sum(c * c) AS BIGINT) AS ss
      FROM cents GROUP BY event_type
    ),
    w AS (
      SELECT
        max(CASE WHEN event_type = 'view' THEN n END) AS na,
        max(CASE WHEN event_type = 'view' THEN s END) AS sa,
        max(CASE WHEN event_type = 'view' THEN ss END) AS ssa,
        max(CASE WHEN event_type = 'click' THEN n END) AS nb,
        max(CASE WHEN event_type = 'click' THEN s END) AS sb,
        max(CASE WHEN event_type = 'click' THEN ss END) AS ssb
      FROM m
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb) / 100, 6)
             AS mean_diff,
           round((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
                 / sqrt(
                     (CAST(na AS DOUBLE) * ssa - CAST(sa AS DOUBLE) * sa)
                       / (CAST(na AS DOUBLE) * na * (na - 1))
                     + (CAST(nb AS DOUBLE) * ssb - CAST(sb AS DOUBLE) * sb)
                       / (CAST(nb AS DOUBLE) * nb * (nb - 1))), 6) AS t_welch
    FROM w
    """,
    doc="Welch's t statistic between the view and click cohorts' event "
    "values — the A/B-experiment primitive, by the exact-moments "
    "discipline (agg-linreg): per-cohort n / sum / sum-of-squares are "
    "exact integer-cents sums from ONE map-side-combined groupBy, and "
    "the closed-form mean difference and t statistic are computed from "
    "those integers at the end — identical doubles cross-engine, so a "
    "classically float-fragile statistic hash-gates. Two rows of "
    "moments regardless of event count; this is also the mergeable / "
    "streamable form (partial moments add).",
)
def agg_abtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    cents = t.events.where(
        F.col("event_type").isin("view", "click") & F.col("value").isNotNull()
    ).select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("c")
    )
    m = cents.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )
    w = m.agg(
        F.max(F.when(F.col("event_type") == "view", F.col("n"))).alias("na"),
        F.max(F.when(F.col("event_type") == "view", F.col("s"))).alias("sa"),
        F.max(F.when(F.col("event_type") == "view", F.col("ss"))).alias("ssa"),
        F.max(F.when(F.col("event_type") == "click", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("event_type") == "click", F.col("s"))).alias("sb"),
        F.max(F.when(F.col("event_type") == "click", F.col("ss"))).alias("ssb"),
    )
    mean_a = F.col("sa").cast("double") / F.col("na")
    mean_b = F.col("sb").cast("double") / F.col("nb")
    var_a = (
        F.col("na").cast("double") * F.col("ssa")
        - F.col("sa").cast("double") * F.col("sa")
    ) / (F.col("na").cast("double") * F.col("na") * (F.col("na") - 1))
    var_b = (
        F.col("nb").cast("double") * F.col("ssb")
        - F.col("sb").cast("double") * F.col("sb")
    ) / (F.col("nb").cast("double") * F.col("nb") * (F.col("nb") - 1))
    return w.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round((mean_a - mean_b) / 100, 6).alias("mean_diff"),
        F.round((mean_a - mean_b) / F.sqrt(var_a + var_b), 6).alias("t_welch"),
    )


def _rendezvous_sql(n_shards: int, alias: str) -> str:
    cands = ", ".join(
        f"(CAST(concat('0x', substr(md5(concat('rv', {s}, ':', "
        f"CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT), {s})"
        for s in range(n_shards)
    )
    return (
        f"list_transform(list_sort([{cands}]), x -> x[2])"
        f"[{n_shards}] AS {alias}"
    )


@register(
    "fn-rendezvous",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id,
             {_rendezvous_sql(5, "shard5")},
             {_rendezvous_sql(6, "shard6")}
      FROM documents
    )
    SELECT CAST(shard6 AS BIGINT) AS shard6,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN shard5 <> shard6 THEN 1 ELSE 0 END) AS BIGINT)
             AS moved
    FROM assigned GROUP BY shard6
    """,
    doc="Rendezvous (highest-random-weight) shard assignment — the "
    "layout-stability primitive for incremental pipelines: each doc "
    "goes to argmax over shards of hash(shard, key), so growing 5 -> 6 "
    "shards moves ONLY the docs the new shard now wins (~1/6 in "
    "expectation) instead of rehashing ~5/6 of the corpus like mod-N "
    "bucketing. Emitted per NEW shard with the exact moved count — "
    "the minimal-disruption property as data, gate-pinned (a scale "
    "test asserts the moved fraction sits near 1/6 and that every "
    "move lands on the new shard). Pure per-row expressions, "
    "map-side-combined final count; portable hash so the oracle "
    "replays every argmax bit-for-bit.",
)
def fn_rendezvous(spark: SparkSession, sf_dir: str) -> DataFrame:
    from itdb_spark.functions.core import portable_hash64

    t = Tables(spark, sf_dir)

    # shard(5) and shard(6) spell out 11 md5 calls in the expression tree
    # (the five shard-0..4 hashes appear in both), but whole-stage
    # codegen's subexpression elimination computes each DISTINCT hash
    # once — a same-session A/B against a shared-sorted-array form that
    # guarantees 6 tree-level hashes measured identical (sf0.1, noop
    # sink, alternating: 0.91 vs 0.94 s per 5 runs), so the simpler
    # per-n form stays.
    def shard(n: int):
        weights = F.array(
            *[
                F.struct(
                    portable_hash64(
                        F.concat(
                            F.lit("rv"),
                            F.lit(s).cast("string"),
                            F.lit(":"),
                            F.col("doc_id").cast("string"),
                        )
                    ).alias("h"),
                    F.lit(s).alias("s"),
                )
                for s in range(n)
            ]
        )
        return F.element_at(F.array_sort(weights), n).getField("s")

    assigned = t.documents.select(
        "doc_id", shard(5).alias("shard5"), shard(6).alias("shard6")
    )
    return assigned.groupBy("shard6").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("shard5") != F.col("shard6"), 1).otherwise(0))
        .cast("long")
        .alias("moved"),
    ).select(F.col("shard6").cast("long"), "n_docs", "moved")
