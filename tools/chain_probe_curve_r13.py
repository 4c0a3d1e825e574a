#!/usr/bin/env python
"""Round-13 measurement (r12 VERDICT #3): containment probe wall as a
function of APPEND-CHAIN LENGTH at sf1.0 — the read-amplification curve
that justifies maybe_compact_chain's threshold.

The experiment isolates chain length from content: every scenario
indexes the SAME corpus (the stream-contain-live 'old' slice plus the
same delta slice), differing only in how many delta dirs the chain
holds — 0 appends (all content in one replace version), 4, or 16 —
plus a post-compaction rerun of the 16-link chain. The probe batch is
a fixed held-out slice, identical across scenarios, timed best-of-2
noop-sink walls after a warmup. Emitted pair counts are asserted EQUAL
across scenarios (the layout must not change answers).

Prints one JSON line per scenario:
  {"links": N, "probe_wall": s, "rows": n, "compacted": bool}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from itdb_spark.operators.dedup import (
    append_containment_index,
    containment_probe_persisted,
    persist_containment_index,
)
from itdb_spark.queries.pipeline import corpus
from itdb_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1.0"


def probe_wall(spark, root, probe):
    best = float("inf")
    rows = None
    for _ in range(3):  # first pass is warmup
        t0 = time.perf_counter()
        out = containment_probe_persisted(spark, root, probe, "doc_id", "text")
        n = out.count()
        w = time.perf_counter() - t0
        if rows is None:
            rows = n
        else:
            assert rows == n
        best = min(best, w)
    return best, rows


def main() -> None:
    spark = get_spark("chain_curve_r13", cpus=32)
    docs = corpus(spark, SF_DIR).select("doc_id", "source", "text")
    old = docs.where(F.col("doc_id") % 5 != 4)
    delta = docs.where(F.col("doc_id") % 10 == 4).cache()
    probe = docs.where(F.col("doc_id") % 10 == 9).cache()
    delta.count(), probe.count()

    work = tempfile.mkdtemp(prefix="itdb_chain_curve_")
    results = []
    try:
        # scenario: same content, K delta links (K=0 builds it all in
        # one replace version)
        for k in (0, 4, 16):
            root = os.path.join(work, f"idx{k}")
            if k == 0:
                persist_containment_index(
                    old.unionByName(delta), "doc_id", "text", root
                )
            else:
                persist_containment_index(old, "doc_id", "text", root)
                for i in range(k):
                    sub = delta.where(
                        F.expr("doc_id DIV 10") % k == i
                    )
                    append_containment_index(
                        spark, root, sub, "doc_id", "text"
                    )
            w, n = probe_wall(spark, root, probe)
            results.append(
                {"links": k + 1, "probe_wall": round(w, 3), "rows": n,
                 "compacted": False}
            )
            print(json.dumps(results[-1]), flush=True)

        # compact the 16-link chain and re-probe: the fold must restore
        # the single-version wall AND the same answers
        from itdb_spark.sinks.versioned import compact_chain

        root = os.path.join(work, "idx16")
        stats = compact_chain(spark, root)
        w, n = probe_wall(spark, root, probe)
        results.append(
            {"links": 1, "probe_wall": round(w, 3), "rows": n,
             "compacted": True, "files_before": stats["files_before"],
             "files_after": stats["files_after"]}
        )
        print(json.dumps(results[-1]), flush=True)

        counts = {r["rows"] for r in results}
        assert len(counts) == 1, f"layout changed answers: {counts}"
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
