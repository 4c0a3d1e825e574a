#!/usr/bin/env python
"""Plan audit over the registry: for each query (default: the bench
headline set, or pass query ids), print the physical-plan properties the
scale review cares about — scans and their pruned ReadSchema widths,
single-partition exchanges, nested-loop joins, broadcast joins, and
whole-stage-codegen span count. This is the repeatable form of the
".explain and iterate until it's the plan you'd want" discipline; SCALE.md
cites its output.

Caveats: cached subtrees print their source scan once per reference, so
`scans` over-counts for queries that cache()/reuse frames (execution hits
the InMemoryTableScan); `codegen` reads formatted explain, which hides
codegen ids inside un-finalized AdaptiveSparkPlan wrappers — 0 there
means "AQE plan", not "interpreted". A BNLJ flag on sim-knn-brute is the
intentional brute-force broadcast cross join (the exactness baseline).

    python tools/audit_plans.py [sf_dir] [query-id ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from itdb_spark.queries import load_all
from itdb_spark.session import get_spark


def audit(plan: str) -> dict:
    # scan count from the marker itself; per-scan widths only for schemas
    # the flat regex can parse (nested types embed '>' and are skipped)
    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "scans": plan.count("ReadSchema:"),
        "scan_cols": [len(s.split(",")) if s else 0 for s in read_schemas],
        "single_partition_exchanges": plan.count("Exchange SinglePartition"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "codegen_spans": 0,  # filled from explain("formatted") by main()
        "pushed_filters": plan.count("PushedFilters: ["),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    registry = load_all()
    only = sys.argv[2:] or [qid for qid, q in registry.items() if q.bench]
    spark = get_spark("plan_audit", cpus=8)
    for qid in only:
        df = registry[qid].spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        a = audit(plan)
        # codegen spans only show in formatted explain ("[codegen id : n]")
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        a["codegen_spans"] = len(set(re.findall(r"\[codegen id : (\d+)\]", buf.getvalue())))
        flags = []
        if a["nested_loop_joins"]:
            flags.append("BNLJ!")
        if a["single_partition_exchanges"]:
            flags.append("SINGLE-PARTITION!")
        print(
            f"{qid:22s} scans={a['scans']} cols/scan={a['scan_cols']} "
            f"bhj={a['broadcast_hash_joins']} smj={a['sort_merge_joins']} "
            f"codegen={a['codegen_spans']} pushed={a['pushed_filters']} "
            f"{' '.join(flags)}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
