#!/usr/bin/env python
"""Dump .explain("formatted") for every bench-headline query to
plans/r15/<qid>_<tag>.txt — the optimization round's before/after plan
record (the judge checks plan claims against these files).

Usage: python tools/dump_plans_r15.py <tag> [qid ...]
    tag = "before" | "after" (file suffix)
    qid filter optional; default = all bench queries.

The bench path (deploy twin where registered) is what gets explained —
that is the plan bench.py times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from itdb_spark.queries import load_all
from itdb_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plan_dump_r15", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 16)))
    registry = load_all()
    for qid, q in sorted(registry.items()):
        if not q.bench or (only and qid not in only):
            continue
        fn = q.bench_spark or q.spark
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - record the failure in the file
            plan = f"ERROR building plan: {type(e).__name__}: {e}"
        path = os.path.join(OUT_DIR, f"{qid}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {qid} [{tag}] sf_dir={SF_DIR}\n")
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
