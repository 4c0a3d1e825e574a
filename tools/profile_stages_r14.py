#!/usr/bin/env python
"""Per-stage wall attribution for a bench query via the Spark event log.

Runs <qid>'s bench path once warm (bench methodology: warmup run, then a
timed run) inside a session with eventLog enabled, then parses the event
log: per-job and per-stage submit/complete walls plus the GAPS between
consecutive stages (driver/AQE barrier overhead) — the measurement guide
§1 asks for before touching anything.

Usage: python tools/profile_stages_r14.py <qid> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

EVT_DIR = "/tmp/spark-events-r14"


def main() -> None:
    qid = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    os.makedirs(EVT_DIR, exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    n = os.environ["SPARK_GRAFT_CPUS"]
    spark = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(f"profile_{qid}")
        .config("spark.sql.shuffle.partitions", str(max(int(n), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVT_DIR)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    app_id = spark.sparkContext.applicationId

    from itdb_spark.queries import load_all

    registry = load_all()
    q = registry[qid]
    fn = q.bench_spark or q.spark

    def run() -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    w = run()  # warmup (pays memoized index builds, JVM warm)
    w2 = run()  # second warmup: JIT/codegen caches (bench is min-of-3)
    spark.sparkContext.setJobDescription(f"TIMED:{qid}")
    t_marker = time.time() * 1000
    t = run()
    spark.sparkContext.setJobDescription(None)
    print(f"{qid}: warmup {w:.3f}s / {w2:.3f}s timed {t:.3f}s")
    spark.stop()

    # --- parse the event log -------------------------------------------
    path = os.path.join(EVT_DIR, app_id)
    if not os.path.exists(path):
        cand = [
            os.path.join(EVT_DIR, d, f)
            for d in os.listdir(EVT_DIR)
            if app_id in d
            for f in os.listdir(os.path.join(EVT_DIR, d))
            if f.startswith("events_")
        ]
        path = cand[0]
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    for line in open(path):
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            if e.get("Submission Time", 0) >= t_marker - 50:
                jobs[e["Job ID"]] = {
                    "t0": e["Submission Time"],
                    "stages": [s["Stage ID"] for s in e["Stage Infos"]],
                }
        elif ev == "SparkListenerJobEnd":
            if e["Job ID"] in jobs:
                jobs[e["Job ID"]]["t1"] = e.get("Completion Time", 0)
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            stages[si["Stage ID"]] = {
                "sub": si.get("Submission Time", 0),
                "done": si.get("Completion Time", 0),
                "name": si.get("Stage Name", "")[:60],
                "tasks": si.get("Number of Tasks", 0),
            }

    if not jobs:
        print("no jobs captured after marker")
        return
    jmin, jmax = min(jobs), max(jobs)
    tstart = min(j["t0"] for j in jobs.values())
    tend = max(j.get("t1", 0) for j in jobs.values())
    print(f"jobs {jmin}..{jmax} ({len(jobs)} jobs), wall {(tend-tstart)/1000:.3f}s")
    # stage timeline for the timed window
    evs = []
    for sid, s in sorted(stages.items()):
        if s["sub"] >= t_marker - 50:
            evs.append((s["sub"], s["done"], sid, s))
    evs.sort()
    prev_done = tstart
    gap_total = 0.0
    stage_total = 0.0
    for sub, done, sid, s in evs:
        gap = (sub - prev_done) / 1000
        dur = (done - sub) / 1000
        gap_total += max(gap, 0)
        stage_total += dur
        print(
            f"  stage {sid:4d} gap={gap:6.3f} dur={dur:6.3f} "
            f"tasks={s['tasks']:3d} {s['name']}"
        )
        prev_done = max(prev_done, done)
    print(
        f"TOTAL stage-exec {stage_total:.3f}s, inter-stage gap {gap_total:.3f}s, "
        f"jobs {len(jobs)}, stages {len(evs)}"
    )


if __name__ == "__main__":
    main()
