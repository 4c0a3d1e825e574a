#!/usr/bin/env python
"""Interleaved A/B: spark.sql.constraintPropagation.enabled on vs off
for the composed-plan bench queries whose remaining wall is dominated
by driver planning gaps (OPTIMIZATION_r15.md "Not yet optimized"):
the containment trio, pipe-curate, sim-knn-ivfpq, dedup-jaccard,
dedup-incremental.

Constraint propagation walks every operator's constraint set on each
optimization pass; its cost is quadratic-ish in plan width/depth and
it exists to infer IsNotNull/filter pushdowns the engine's plans
already state explicitly (every join key here is non-null by
construction: hashes, ids, exploded shingles). The flag changes PLAN
COST only, never results — but plans may lose inferred filters, so
the A/B times the full construct+action wall (the bench's own timed
region) and the oracle gate must re-run before shipping.

Usage: python tools/constraint_ab_r15.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from itdb_spark.queries import load_all
from itdb_spark.session import default_parallelism, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QIDS = [
    "dedup-contain-exact",
    "dedup-contain-incr",
    "dedup-contain-incr-persist",
    "pipe-curate",
    "sim-knn-ivfpq",
    "dedup-jaccard",
    "dedup-incremental",
]
FLAG = "spark.sql.constraintPropagation.enabled"


def run_one(spark, q) -> tuple[float, float]:
    t0 = time.perf_counter()
    df = q(spark, SF_DIR)
    t1 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.perf_counter()
    return t1 - t0, t2 - t1


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("constraint_ab_r15", cpus=default_parallelism())
    registry = load_all()
    qs = {qid: (registry[qid].bench_spark or registry[qid].spark) for qid in QIDS}

    # warmup both settings once so JIT/readers/Python workers are hot
    for setting in ("true", "false"):
        spark.conf.set(FLAG, setting)
        for qid in QIDS:
            spark.catalog.clearCache()
            run_one(spark, qs[qid])

    results: dict[str, dict[str, list[tuple[float, float]]]] = {
        qid: {"true": [], "false": []} for qid in QIDS
    }
    for r in range(rounds):
        for setting in ("true", "false") if r % 2 == 0 else ("false", "true"):
            spark.conf.set(FLAG, setting)
            for qid in QIDS:
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(
                    f"ab:{qid}:{setting}:r{r}"
                )
                results[qid][setting].append(run_one(spark, qs[qid]))
    spark.conf.set(FLAG, "true")

    print(f"\n{'query':30s} {'on c/a':>15s} {'off c/a':>15s} {'off/on':>7s}")
    for qid in QIDS:
        on = results[qid]["true"]
        off = results[qid]["false"]
        on_c = min(c for c, _ in on)
        on_a = min(a for _, a in on)
        off_c = min(c for c, _ in off)
        off_a = min(a for _, a in off)
        ratio = (off_c + off_a) / (on_c + on_a)
        print(
            f"{qid:30s} {on_c:6.2f}/{on_a:6.2f} {off_c:6.2f}/{off_a:6.2f} "
            f"{ratio:7.2f}"
        )
        for r in range(rounds):
            print(
                f"    r{r}: on {on[r][0]:.2f}+{on[r][1]:.2f}"
                f"  off {off[r][0]:.2f}+{off[r][1]:.2f}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
