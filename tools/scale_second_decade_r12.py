#!/usr/bin/env python
"""Round-12 second-decade measurement (VERDICT r11 #2/#3/#4): three-point
scale rows for the round-11 late cohort the round-11 table never covered
(the robust-stats seven, emb-project, eval-sketch-error, join-bloom,
stream-topk-live), the containment build/serve pair (dedup-contain-incr
vs the new dedup-contain-incr-persist), and the replica-keyed
incremental-dedup pair re-measured with a constant batch fraction.

Procedure matches SCALE.md §"The 100× point" exactly: same-session,
best-of-2 noop-sink walls after a warmup (which also pays any one-time
persisted-index build), local[32], over /root/testdata/sf0.1 and the
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

QIDS = [
    # VERDICT r11 #2: the containment build/serve pair
    "dedup-contain-incr",
    "dedup-contain-incr-persist",
    # VERDICT r11 #3: replica-keyed splits, constant batch fraction
    "dedup-incremental",
    "dedup-incr-persist",
    # VERDICT r11 #4: the never-measured late-round-11 cohort
    "agg-mode",
    "agg-iqr",
    "agg-mad",
    "agg-welch",
    "agg-winsorize",
    "agg-mannkendall",
    "agg-theilsen",
    "emb-project",
    "eval-sketch-error",
    "join-bloom",
    "stream-topk-live",
]

SF_DIRS = [
    ("0.1", "/root/testdata/sf0.1"),
    ("1.0", "/root/repo/.scale/sf1.0"),
    ("10", "/root/repo/.scale/sf10"),
]


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark("scale_r12", cpus=32)
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
