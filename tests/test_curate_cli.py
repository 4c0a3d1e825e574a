"""tools/curate.py end-to-end: every stage must actually fire on a
corpus engineered to trigger it, and the outputs must be loadable,
deterministic, and internally consistent."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F


def test_curate_cli_end_to_end(spark, tmp_path):
    base = " ".join(f"w{i}" for i in range(60))
    boiler = " ".join(f"b{i}" for i in range(10))  # shared 10-token run
    rows = [
        (1, f"{base} unique tail one", "en", "web", 300),
        (2, f"{base} unique tail one", "en", "web", 300),      # exact dup of 1
        (3, base + " two", "en", "web", 290),                   # near dup of 1
        (4, f"{boiler} alpha beta gamma delta epsilon", "en", "web", 120),
        (5, f"{boiler} zeta eta theta iota kappa", "en", "web", 120),
        (6, "@@@@@@@@ ##########", "en", "web", 19),            # junk: fails quality
        (7, " ".join(f"good{i}" for i in range(40)), "en", "books", 250),
    ]
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(indir / "documents.parquet"))

    import tools.curate as curate

    report = curate.main([
        "--input", str(indir), "--output", str(outdir),
        "--quality", "0.5", "--budget", "32",
    ])
    st = report["stages"]
    assert st["input"]["rows"] == 7
    assert st["exact_dedup"]["removed"] == 1           # doc 2
    assert st["near_dedup"]["removed"] == 1            # doc 3 (LSH+Jaccard+CC)
    assert st["despan"]["tokens_removed"] >= 20        # boiler run in 4 AND 5
    assert st["quality"]["removed"] >= 1               # doc 6
    assert st["pack"]["packs"] >= 2                    # 32-token budget splits

    corpus = spark.read.parquet(str(outdir / "corpus"))
    got_ids = {r.doc_id for r in corpus.collect()}
    assert 1 in got_ids and 2 not in got_ids and 3 not in got_ids
    assert 6 not in got_ids
    assert {4, 5, 7} <= got_ids
    # the boilerplate run is excised from BOTH survivors
    texts = {r.doc_id: r.text for r in corpus.collect()}
    assert "b0" not in texts[4] and "b0" not in texts[5]
    # epoch positions are a permutation of 1..n
    pos = sorted(r.epoch_pos for r in corpus.collect())
    assert pos == list(range(1, len(pos) + 1))
    # pack geometry covers every surviving token exactly once
    packs = spark.read.parquet(str(outdir / "packs"))
    tok_total = corpus.agg(F.sum("n_tokens")).collect()[0][0]
    slice_total = packs.agg(F.sum("slice_len")).collect()[0][0]
    assert tok_total == slice_total
    # report round-trips from disk
    on_disk = json.loads((outdir / "report.json").read_text())
    assert on_disk["output"]["corpus_rows"] == len(got_ids)


def test_curate_cli_deterministic(spark, tmp_path):
    """Two runs over the same input produce IDENTICAL corpus rows, pack
    geometry, and report — the property that makes the pipeline
    resumable and its outputs diffable across reruns."""
    import pyspark.sql.functions as F  # noqa: F401

    rows = [
        (i, " ".join(f"t{(i * 13 + j * 5) % 41}" for j in range(30)),
         "en", f"s{i % 3}", 150)
        for i in range(40)
    ]
    indir = tmp_path / "in"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(indir / "documents.parquet"))

    import tools.curate as curate

    outs = []
    for d in ("out_a", "out_b"):
        outdir = tmp_path / d
        rep = curate.main(["--input", str(indir), "--output", str(outdir)])
        corpus = {
            tuple(r) for r in spark.read.parquet(str(outdir / "corpus")).collect()
        }
        packs = {
            tuple(r) for r in spark.read.parquet(str(outdir / "packs")).collect()
        }
        outs.append((corpus, packs, rep))
    assert outs[0][0] == outs[1][0], "corpus rows differ between runs"
    assert outs[0][1] == outs[1][1], "pack geometry differs between runs"
    assert outs[0][2] == outs[1][2], "reports differ between runs"


def test_curate_nfc_stage_merges_visually_equal_dupes(spark, tmp_path):
    """The normalize stage must make pre/de-composed forms of the same
    rendered text collide in the exact-dedup fingerprint: two docs whose
    bytes differ only by NFC form survive as ONE doc, and the report
    attributes the NFC rewrite and the resulting dedup separately."""
    composed = "café " + " ".join(f"w{i}" for i in range(40))
    decomposed = "café " + " ".join(f"w{i}" for i in range(40))
    assert composed != decomposed  # different code points...
    rows = [
        (1, composed, "fr", "web", 200),
        (2, decomposed, "fr", "web", 201),  # ...same rendered text
        (3, " ".join(f"solo{i}" for i in range(40)), "en", "web", 250),
    ]
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(indir / "documents.parquet"))

    import tools.curate as curate

    report = curate.main(
        ["--input", str(indir), "--output", str(outdir), "--quality", "0.0"]
    )
    st = report["stages"]
    assert st["normalize"] == {"rows": 3, "changed": 1}  # doc 2 rewritten
    assert st["exact_dedup"]["removed"] == 1             # then deduped vs doc 1
    kept = {
        r.doc_id
        for r in spark.read.parquet(str(outdir / "corpus")).select("doc_id").collect()
    }
    assert 2 not in kept and 1 in kept and 3 in kept
