#!/usr/bin/env python
"""Scale A/B for the r15 in-row shingle-set builds: the claim on the
record ("the removed groupBy(doc) exchange is the SCALE cost, not the
bench-scale cost") measured instead of asserted.

containment_join's ``shingles=`` argument keeps the pre-r15
explode→groupBy(doc) doc_sets path verbatim (caller-provided frames
are deliberately unrewritten), so old-vs-new is two calls into the
SAME shipped operator — no reconstruction drift:

  old: containment_join(c, shingles=shingle_frame(c).fold)
  new: containment_join(c)                      # in-row doc_shingle_sets

Interleaved rounds, full construct+action wall (the bench's timed
region), one equality spot-check per SF.

Usage: SPARK_GRAFT_SF_DIR=<dir> python tools/inrow_scale_ab_r15.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from itdb_spark.operators.dedup import containment_join, shingle_frame
from itdb_spark.session import default_parallelism, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _docs(spark):
    from itdb_spark.queries.pipeline import corpus

    return corpus(spark, SF_DIR)


def old_form(spark):
    c = _docs(spark)
    sh = shingle_frame(c, "doc_id", "text").select(
        "doc", F.xxhash64("w").alias("w")
    )
    return containment_join(c, "doc_id", "text", shingles=sh)


def new_form(spark):
    return containment_join(_docs(spark), "doc_id", "text")


def timed(spark, fn) -> float:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    df = fn(spark)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("inrow_scale_ab_r15", cpus=default_parallelism())
    print(f"sf_dir={SF_DIR}", flush=True)
    timed(spark, old_form)
    timed(spark, new_form)
    o, n = old_form(spark), new_form(spark)
    print(
        "rows equal:",
        o.exceptAll(n).count() == 0 and n.exceptAll(o).count() == 0,
        flush=True,
    )
    olds, news = [], []
    for r in range(rounds):
        olds.append(timed(spark, old_form))
        news.append(timed(spark, new_form))
        print(f"round {r}: old {olds[-1]:.2f}s new {news[-1]:.2f}s", flush=True)
    print(f"old: {[round(x, 2) for x in olds]}")
    print(f"new: {[round(x, 2) for x in news]}")
    spark.stop()


if __name__ == "__main__":
    main()
