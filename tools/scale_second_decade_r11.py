#!/usr/bin/env python
"""Round-11 second-decade measurement (VERDICT r10 #4): extend the 100×
table to the containment family + graph-linkpred, and measure the
dedup-incr-persist probe-vs-rebuild ratio at scale.

Procedure matches SCALE.md §"The 100× point" exactly: same-session,
best-of-2 noop-sink walls, local[32], over /root/testdata/sf0.1 and the
make_scale_dir-derived .scale/sf1.0 and .scale/sf10 corpora. Prints one
JSON line per (query, sf).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from itdb_spark.queries import load_all
from itdb_spark.session import get_spark

# The VERDICT r10 #4 cohort, the round-11 additions measured for
# SCALE.md's round-11 tables, and the corpus()-based trio re-measured
# after the doc-id block remap. Pass qids as argv to subset.
QIDS = [
    "dedup-contain-exact",
    "dedup-contain-incr",
    "dedup-contain-cluster",
    "graph-linkpred",
    "dedup-incr-persist",
    "dedup-incremental",
    "dedup-exactspan",
    "text-despan-exact",
    "graph-bfs",
    "emb-pca",
    "emb-kmeans",
    "emb-cov",
    "mm-pixeldedup",
    "dedup-exact",
    "dedup-minhash",
    "dedup-jaccard",
]

SF_DIRS = [
    ("0.1", "/root/testdata/sf0.1"),
    ("1.0", "/root/repo/.scale/sf1.0"),
    ("10", "/root/repo/.scale/sf10"),
]


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark("scale_r11", cpus=32)
    registry = load_all()
    for sf, sf_dir in SF_DIRS:
        for qid in QIDS:
            if only and qid not in only:
                continue
            fn = registry[qid].bench_spark or registry[qid].spark
            spark.catalog.clearCache()
            try:
                # warmup (also builds any persisted index / memoized state)
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
                print(json.dumps({"qid": qid, "sf": sf, "wall_s": round(best, 3)}),
                      flush=True)
            except Exception as e:  # record the failure shape, keep going
                print(json.dumps({"qid": qid, "sf": sf,
                                  "error": f"{type(e).__name__}: {str(e)[:200]}"}),
                      flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
