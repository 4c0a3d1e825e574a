#!/usr/bin/env python
"""Interleaved A/B for the r15 dedup-jaccard rewrite: the pre-r15
composition (cached shared shingle explode + checkpointed words +
groupBy collect_list/count + sizes joins) vs the shipped form
(ngram_jaccard_pairs' in-row shingle arrays, no shared cache).

Both forms time the bench's own region — construct + noop action —
alternating old/new per round so ambient load hits both evenly.

Usage: python tools/jaccard_ab_r15.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from itdb_spark.operators.dedup import (
    minhash_candidates,
    ngram_jaccard_pairs,
    shingle_frame,
)
from itdb_spark.queries import load_all
from itdb_spark.session import default_parallelism, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_impl(spark, sf_dir):
    """The pre-r15 _dedup_jaccard_impl + ngram_jaccard_pairs candidates
    path, reconstructed verbatim (xxhash64 deploy twin)."""
    from itdb_spark.plans.library import materialized, truncate_lineage
    from itdb_spark.queries.pipeline import corpus

    c = corpus(spark, sf_dir)
    sh = shingle_frame(c, "doc_id", "text").cache()
    cands = minhash_candidates(c, "doc_id", "text", shingles=sh, hash_fn="xxhash64")
    words = truncate_lineage(sh.select("doc", F.xxhash64("w").alias("w")))
    sizes = words.groupBy("doc").agg(F.count("*").alias("sz"))
    arrs = words.groupBy("doc").agg(F.collect_list("w").alias("ws"))
    a = arrs.select(F.col("doc").alias("id1"), F.col("ws").alias("ws1"))
    b = arrs.select(F.col("doc").alias("id2"), F.col("ws").alias("ws2"))
    common = (
        cands.select("id1", "id2")
        .join(a, "id1")
        .join(b, "id2")
        .select("id1", "id2", F.size(F.array_intersect("ws1", "ws2")).alias("common"))
    )
    sa = sizes.select(F.col("doc").alias("id1"), F.col("sz").alias("sz1"))
    sb = sizes.select(F.col("doc").alias("id2"), F.col("sz").alias("sz2"))
    jac = F.col("common").cast("double") / (
        F.col("sz1") + F.col("sz2") - F.col("common")
    ).cast("double")
    verified = (
        common.join(sa, "id1")
        .join(sb, "id2")
        .select("id1", "id2", F.round(jac, 4).alias("jaccard"))
        .where(F.col("jaccard") >= 0.5)
    )
    out = materialized(verified, words)
    sh.unpersist()
    return out


def new_impl(spark, sf_dir):
    registry = load_all()
    q = registry["dedup-jaccard"]
    return (q.bench_spark or q.spark)(spark, sf_dir)


def new_nockpt_impl(spark, sf_dir):
    """In-row arrays WITHOUT the checkpoint: both join sides recompute
    the scan+HOF projection (no block write/read)."""
    from itdb_spark.operators.dedup import shingle_set_col
    from itdb_spark.plans.library import materialized
    from itdb_spark.queries.pipeline import corpus

    c = corpus(spark, sf_dir)
    cands = minhash_candidates(c, "doc_id", "text", hash_fn="xxhash64")
    arrs = c.where(F.col("text").isNotNull()).select(
        F.col("doc_id").alias("doc"), shingle_set_col("text").alias("ws")
    )
    a = arrs.select(F.col("doc").alias("id1"), F.col("ws").alias("ws1"))
    b = arrs.select(F.col("doc").alias("id2"), F.col("ws").alias("ws2"))
    common = (
        cands.select("id1", "id2")
        .join(a, "id1")
        .join(b, "id2")
        .select(
            "id1",
            "id2",
            F.size(F.array_intersect("ws1", "ws2")).alias("common"),
            F.size("ws1").alias("sz1"),
            F.size("ws2").alias("sz2"),
        )
    )
    jac = F.col("common").cast("double") / (
        F.col("sz1") + F.col("sz2") - F.col("common")
    ).cast("double")
    verified = common.select(
        "id1", "id2", F.round(jac, 4).alias("jaccard")
    ).where(F.col("jaccard") >= 0.5)
    return materialized(verified)


def timed(spark, fn) -> float:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    df = fn(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("jaccard_ab_r15", cpus=default_parallelism())
    # warmup both forms
    timed(spark, old_impl)
    timed(spark, new_impl)
    # equality spot check once (order-insensitive multiset)
    o = old_impl(spark, SF_DIR)
    n = new_impl(spark, SF_DIR)
    eq = o.exceptAll(n).count() == 0 and n.exceptAll(o).count() == 0
    print(f"rows equal: {eq}", flush=True)
    timed(spark, new_nockpt_impl)
    olds, news, nocks = [], [], []
    for r in range(rounds):
        olds.append(timed(spark, old_impl))
        news.append(timed(spark, new_impl))
        nocks.append(timed(spark, new_nockpt_impl))
        print(
            f"round {r}: old {olds[-1]:.2f}s new {news[-1]:.2f}s "
            f"nockpt {nocks[-1]:.2f}s",
            flush=True,
        )
    print(f"old:    {[round(x, 2) for x in olds]}")
    print(f"new:    {[round(x, 2) for x in news]}")
    print(f"nockpt: {[round(x, 2) for x in nocks]}")
    spark.stop()


if __name__ == "__main__":
    main()
