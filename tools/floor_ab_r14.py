#!/usr/bin/env python
"""Interleaved same-session A/B for the IVF/PQ scan-parallelism floor.

Arm A = floor active (working-tree code); arm B = floor monkeypatched to
identity. Alternating rounds in ONE Spark session cancel host drift (the
instrument BASELINE.md prescribes for this host's ±40% envelope).

Usage: python tools/floor_ab_r14.py <qid> [<qid> ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from itdb_spark.queries import load_all
from itdb_spark.session import default_parallelism, get_spark
import itdb_spark.plans.library as lib

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = 3
REPS = 3

_real_floor = lib.scan_parallelism_floor


def main() -> None:
    qids = sys.argv[1:]
    spark = get_spark("floor_ab_r14", cpus=default_parallelism())
    registry = load_all()
    out: dict[str, dict[str, list[float]]] = {q: {"A": [], "B": []} for q in qids}

    fns = {q: (registry[q].bench_spark or registry[q].spark) for q in qids}
    # warmup both arms (memoized builds, JIT)
    for q in qids:
        for arm in ("A", "B"):
            lib.scan_parallelism_floor = _real_floor if arm == "A" else (lambda df: df)
            spark.catalog.clearCache()
            fns[q](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    for r in range(ROUNDS):
        order = ("A", "B") if r % 2 == 0 else ("B", "A")
        for arm in order:
            lib.scan_parallelism_floor = _real_floor if arm == "A" else (lambda df: df)
            for q in qids:
                spark.catalog.clearCache()
                best = float("inf")
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    fns[q](spark, SF_DIR).write.format("noop").mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
                out[q][arm].append(round(best, 3))
    lib.scan_parallelism_floor = _real_floor
    for q in qids:
        a, b = out[q]["A"], out[q]["B"]
        print(
            f"{q}: floorON {a} (min {min(a):.3f})  floorOFF {b} (min {min(b):.3f})"
            f"  ratio ON/OFF {min(a) / min(b):.3f}"
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
