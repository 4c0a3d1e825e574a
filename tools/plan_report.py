#!/usr/bin/env python
"""Generate PLANS.md: the physical-plan evidence for the headline queries.

For each bench-set query (plus the scale-path poster children) this dumps:
  * the operator tree (one line per node, depth-indented);
  * every parquet scan's PushedFilters + ReadSchema (pushdown/pruning
    proof — a scan reading all columns for a 2-column projection is a bug);
  * counts of Exchange / BroadcastExchange / WholeStageCodegen spans.

Run after plan-affecting changes: `python tools/plan_report.py` rewrites
PLANS.md at the repo root; the diff IS the review artifact.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from itdb_spark.queries import load_all
from itdb_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# bench set + representative scale-path queries
EXTRA = ["dedup-embedding", "sim-knn-lsh", "sim-knn-ivf", "join-salted",
         "join-overlap", "fn-pack", "text-repetition", "agg-approx",
         "fn-quantize", "text-winnow", "agg-cube", "dedup-winnow",
         "dedup-templates", "dedup-templates-winnow", "join-asof2",
         "text-decontam", "pipe-mixture", "fn-shuffle",
         "dedup-chunks", "dedup-incremental", "fn-batch", "pipe-balance",
         "pipe-curriculum", "mm-framesample", "mm-features",
         "dedup-span", "dedup-semantic", "agg-funnel", "text-classify",
         "agg-quantile", "text-despan", "text-entropy", "agg-cms",
         "agg-kmv", "mm-audiochunk", "pipe-profile", "fn-zorder",
         "fn-bpe", "fn-bpe-count", "agg-cohort", "agg-sessionize",
         "mm-av-align", "fn-interleave", "win-dist", "src-csv",
         "stream-cms-live", "agg-srcsim", "agg-bloom", "fn-sample-pps",
         "pipe-dedup-eval", "join-nearest", "graph-pagerank",
         "fn-chunk-overlap", "pipe-expectations", "fn-variant", "sim-maxsim", "win-ewma", "agg-linreg", "graph-triangles",
         "sim-bm25", "stream-bloom-live", "text-normalize",
         "sim-knn-pq", "sim-hybrid-rrf", "eval-retrieval", "sim-knn-ivfpq",
         "eval-rouge", "fn-bpe-train", "sim-knn-filtered", "fn-bpe-roundtrip",
         "sim-knn-ivf-incr", "sim-knn-ivf-persist", "sim-knn-ivfpq-res",
         "sim-knn-sq8", "eval-bleu", "dedup-soft", "agg-hll", "agg-ks",
         "eval-chrf", "agg-mannwhitney", "graph-communities",
         "agg-bootstrap", "snap-scd2", "snap-timetravel", "sim-mmr",
         "fn-bpe-eval", "agg-markov", "fn-hashfeat", "agg-anova",
         "pipe-budget", "dedup-allpairs", "pipe-gopher", "agg-autocorr", "agg-benford", "agg-changepoint",
         "dedup-cdc",
         # round 9
         "eval-editdist", "pipe-datacard", "text-readability",
         "dedup-contain", "emb-dimstats", "src-parquet-meta",
         "sim-knn-hamming", "agg-streak", "win-active-users",
         "text-novelty", "agg-ohlc", "agg-timeseries",
         "src-hive-partition", "agg-skyline", "agg-attribution",
         "stream-ohlc-live", "snk-versioned", "text-keyphrase",
         "dedup-normalized", "fn-embed-whiten", "pipe-dsir",
         "agg-affinity", "agg-survival"]


# Queries whose registered result is a small driver-built relation (an
# iterative trainer's output) — the visible plan is a local scan, so the
# report points at the plan gate covering the real distributed work
# instead of mislabeling it as checkpoint materialization.
DRIVER_RESULT_NOTES = {
    "fn-bpe-train": (
        "- note: the visible plan is the driver-built merge-table "
        "result (<= n_merges rows — the Lloyd's-style iterative "
        "trainer's output, like train_pq's codebooks). The per-"
        "iteration pair-count shuffle that dominates training is "
        "plan-gated separately (tests/test_scale_paths.py::"
        "test_bpe_pair_count_partial_aggregates asserts the map-side "
        "partial_sum on operators/packing.py::bpe_pair_counts)."
    ),
}


def tree_lines(plan: str) -> list[str]:
    """Operator tree: the header section of a formatted explain (before
    the per-node detail blocks)."""
    out = []
    for ln in plan.splitlines():
        if ln.startswith("== Physical Plan =="):
            continue
        if not ln.strip():
            break
        # strip codegen ids and expression ids for a stable, reviewable tree
        ln = re.sub(r"#\d+L?", "", ln)
        out.append(ln.rstrip())
    return out


def scan_details(plan: str) -> list[str]:
    out = []
    scan = None
    for ln in plan.splitlines():
        m = re.match(r"^\(\d+\) Scan parquet ?(.*)", ln.strip())
        if m:
            scan = "(parquet)"
        if scan and (s := ln.strip()).startswith(("Location:", "PushedFilters:", "ReadSchema:")):
            if s.startswith("Location:"):
                tbl = re.search(r"([a-z_]+)\.parquet", s)
                out.append(f"- scan `{tbl.group(1) if tbl else '?'}`")
            else:
                cleaned = re.sub(r"#\d+", "", s)
                out.append(f"  - {cleaned}")
    return out


def section_lines(spark, qid: str, fn) -> list[str]:
    """Render one query's PLANS.md section (header through trailing blank).

    Shared by main() and the staleness gate
    (tests/test_plans_md.py::test_plans_md_bench_sections_current), so the
    gate diffs EXACTLY what generation would write — same tree scrub, same
    scan-detail extraction, same notes."""
    df = fn(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    n_ex = len(re.findall(r"\bExchange\b", plan))
    n_bc = len(re.findall(r"BroadcastExchange", plan))
    lines = [f"## {qid}", "", f"exchanges={n_ex} (broadcast={n_bc})", "", "```"]
    lines.extend(tree_lines(plan))
    lines.append("```")
    lines.extend(scan_details(plan))
    if qid in DRIVER_RESULT_NOTES:
        lines.append(DRIVER_RESULT_NOTES[qid])
    if "ExistingRDD" in plan and qid not in DRIVER_RESULT_NOTES:
        lines.append(
            "- note: result is checkpoint-materialized inside the operator "
            "(cache-lifecycle contract, plans/library.py::materialized) — the "
            "visible plan is the checkpoint read; the upstream pipeline's "
            "plan properties are CI-asserted in tests/test_plan_audit.py / "
            "tests/test_scale_paths.py (per-query gates, e.g. agg-srcsim's "
            "test_srcsim_signature_partial_agg_and_bounded_bnlj asserts on "
            "the pre-checkpoint plan via the _srcsim_frames split)."
        )
    lines.append("")
    return lines


def forms_for(registry, qids):
    """(label, callable) pairs: queries with a deploy-grade bench twin
    (xxhash64 hash path) get a second section — the bench times THAT
    plan, so the evidence file must show it alongside the graded
    portable-hash form."""
    forms = []
    for qid in qids:
        forms.append((qid, registry[qid].spark))
        if registry[qid].bench_spark is not None:
            forms.append((f"{qid} (deploy twin)", registry[qid].bench_spark))
    return forms


HEADER = [
    "# PLANS — physical-plan evidence at sf0.01 (generated by tools/plan_report.py)",
    "",
    "Properties asserted in CI live in tests/test_plan_audit.py and",
    "tests/test_scale_paths.py; this file is the human-readable dump:",
    "operator tree + every scan's pushdown/pruning + exchange counts.",
    "",
]

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "PLANS.md")


def main() -> None:
    spark = get_spark("plan_report", cpus=8)
    registry = load_all()
    bench = [qid for qid, q in registry.items() if q.bench]
    # dedup: a qid both bench-flagged and listed in EXTRA must not get
    # two identical sections (the duplicate broke section-addressed
    # diffing and the staleness gate's parse)
    qids = bench + [q for q in EXTRA if q not in set(bench)]

    lines = list(HEADER)
    for qid, fn in forms_for(registry, qids):
        lines.extend(section_lines(spark, qid, fn))
    with open(OUT, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {os.path.normpath(OUT)} ({len(qids)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
