#!/usr/bin/env python
"""Round-13 second-decade measurement: three-point scale rows for the
round's new/changed paths — the ANN ingest loop (stream-ann-ingest-
live), the containment serve pair after the stored-kh/layout change
(dedup-contain-incr / -incr-persist re-measure), the compaction-policy-
bearing stream-contain-live, and mm-ahash (whose stage attribution is
in tools/mm_ahash_profile_r13.py).

Procedure matches SCALE.md §"The 100× point": same-session walls,
local[32], noop sink, over sf0.1 and the make_scale_dir-derived
.scale/sf1.0 and .scale/sf10. Streaming ingest loops run SINGLE-RUN
(each run builds its own temp index and drains a real stream — a
warmup would just double the measurement), batch queries best-of-2
after a warmup. Prints one JSON line per (query, sf).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from itdb_spark.queries import load_all
from itdb_spark.session import get_spark

SINGLE_RUN = {
    "stream-ann-ingest-live", "stream-contain-live",
    "stream-minhash-ingest-live",
}
QIDS = [
    "stream-minhash-ingest-live",
    "stream-ann-ingest-live",
    "stream-contain-live",
    "dedup-contain-incr",
    "dedup-contain-incr-persist",
    "sim-range-brute",
    "sim-range-ivf",
    "mm-ahash",
]

SF_DIRS = [
    ("0.1", "/root/testdata/sf0.1"),
    ("1.0", "/root/repo/.scale/sf1.0"),
    ("10", "/root/repo/.scale/sf10"),
]
# $SCALE_SFS (comma list, e.g. "0.1,1.0") restricts the SF sweep so a
# long sf10 pass can run as its own invocation
_sel = os.environ.get("SCALE_SFS")
if _sel:
    keep = set(_sel.split(","))
    SF_DIRS = [(sf, d) for sf, d in SF_DIRS if sf in keep]


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark("scale_r13", cpus=32)
    registry = load_all()
    for sf, sf_dir in SF_DIRS:
        for qid in QIDS:
            if only and qid not in only:
                continue
            q = registry[qid].bench_spark or registry[qid].spark
            spark.catalog.clearCache()

            def run():
                q(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()

            if qid in SINGLE_RUN:
                t0 = time.perf_counter()
                run()
                wall = time.perf_counter() - t0
            else:
                run()  # warmup (pays any one-time memoized index build)
                wall = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    run()
                    wall = min(wall, time.perf_counter() - t0)
            print(
                json.dumps({"query": qid, "sf": sf, "wall": round(wall, 2)}),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
