"""PLANS.md freshness gate for the bench set (VERDICT r10 #8): the r10
drift adjudication leaned on a byte-diff of PLANS.md, which only works
if the file cannot go stale. OPERATORS.md got this discipline in round
9 (tests/test_operators_md.py); this is the same gate for the physical-
plan evidence, scoped to the bench-set queries (regenerating all ~180
sections needs minutes of plan builds — the bench set is what
BENCH_r*.json times, so those are the sections whose drift would
corrupt an adjudication).

The regeneration goes through tools/plan_report.py::section_lines — the
exact code main() writes with — so a pass means "running the generator
now would reproduce these sections byte-for-byte".
"""

from __future__ import annotations

import os


def _file_sections() -> dict[str, list[str]]:
    from tools.plan_report import OUT

    assert os.path.exists(OUT), "PLANS.md missing — run tools/plan_report.py"
    sections: dict[str, list[str]] = {}
    cur: list[str] | None = None
    for ln in open(OUT).read().splitlines():
        if ln.startswith("## "):
            cur = sections.setdefault(ln[3:], [])
        if cur is not None:
            cur.append(ln)
    return sections


def test_plans_md_bench_sections_current(spark):
    from itdb_spark.queries import load_all
    from tools.plan_report import forms_for, section_lines

    registry = load_all()
    bench_qids = [qid for qid, q in sorted(registry.items()) if q.bench]
    assert bench_qids, "empty bench set would gate nothing"
    on_disk = _file_sections()
    stale: list[str] = []
    for label, fn in forms_for(registry, bench_qids):
        if label not in on_disk:
            stale.append(f"{label}: section missing from PLANS.md")
            continue
        want = section_lines(spark, label, fn)
        # the file joins sections with single blank-line separators; the
        # renderer emits a trailing blank — compare stripped
        got = [ln for ln in on_disk[label]]
        while got and not got[-1]:
            got.pop()
        want_t = list(want)
        while want_t and not want_t[-1]:
            want_t.pop()
        if got != want_t:
            diff = [
                f"  file: {a!r}\n  live: {b!r}"
                for a, b in zip(got, want_t)
                if a != b
            ][:4]
            stale.append(
                f"{label}: section drifted ({len(got)} vs {len(want_t)} "
                "lines)\n" + "\n".join(diff)
            )
    assert not stale, (
        "PLANS.md is stale for the bench set — run tools/plan_report.py:\n"
        + "\n".join(stale)
    )
