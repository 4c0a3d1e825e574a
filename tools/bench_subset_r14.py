#!/usr/bin/env python
"""Bench a SUBSET of headline queries with bench.py's exact methodology
(same session config, per-query warmup, min-of-3 over the noop sink) —
the A/B instrument for optimization round 14: time only the touched
queries so a before/after pair costs minutes, not a full bench run.

Usage: python tools/bench_subset_r14.py <qid> [<qid> ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from itdb_spark.queries import load_all
from itdb_spark.session import default_parallelism, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    qids = sys.argv[1:]
    spark = get_spark("itdb_spark_bench_subset", cpus=default_parallelism())
    registry = load_all()
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for qid in qids:
        spark.catalog.clearCache()
        q = registry[qid].bench_spark or registry[qid].spark
        q(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        best = float("inf")
        runs[qid] = []
        for _ in range(3):
            t0 = time.perf_counter()
            q(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            runs[qid].append(round(dt, 3))
            best = min(best, dt)
        timings[qid] = round(best, 3)
    print(json.dumps({"queries": timings, "runs": runs, "sf_dir": SF_DIR}))
    spark.stop()


if __name__ == "__main__":
    main()
