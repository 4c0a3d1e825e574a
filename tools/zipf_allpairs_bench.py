#!/usr/bin/env python
"""Realistic-vocabulary datapoint for dedup-allpairs (round-8 VERDICT #3).

The prefix filter (Bayardo et al., WWW 2007) presumes Zipfian document
frequencies: each document's rarest-first prefix tokens are RARE, so the
candidate join stays far below quadratic. The driver testdata's ~30-word
saturated synthetic vocabulary violates that premise by construction —
every token is frequent — and BASELINE.md §round-8 documents the
resulting degeneration past sf0.01. This tool builds a corpus with the
SAME document count as sf0.1 (5,000 base docs, tripled to 15,000 by the
graded corpus() derivation) but a Zipf(s=1) vocabulary, then measures:

  * candidate pairs emitted by the prefix join vs the quadratic count,
  * wall time of the full exact dedup-allpairs query,
  * wall time of dedup-jaccard (the probabilistic LSH route) on the
    same corpus, for the switch-point comparison SCALE.md records.

Determinism: tokens are drawn by inverse-CDF over the harmonic sums
with md5-hash uniforms keyed by (doc, position) — no RNG state, same
corpus every run.

Usage: python tools/zipf_allpairs_bench.py [n_docs] [vocab] [out_dir]
Defaults: 5000 docs, 30000-word vocabulary, /tmp/itdb_spark_zipf.
"""

from __future__ import annotations

import bisect
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _u(doc: int, pos: int) -> float:
    """Deterministic uniform in [0, 1) from md5(doc:pos)."""
    h = hashlib.md5(f"{doc}:{pos}".encode()).hexdigest()[:15]
    return int(h, 16) / float(1 << 60)


def build_zipf_docs(dst: str, n_docs: int, vocab: int) -> str:
    """documents.parquet with Zipf(s=1) token frequencies, testdata
    schema (doc_id, text, lang, source, n_chars). Shared-/tmp
    discipline (round-10 ADVICE): the destination dir must be OURS
    (os.makedirs(exist_ok=True) happily reuses an attacker-owned
    pre-created dir), and the parquet write goes stage + os.replace so
    a planted symlink at the filename cannot redirect it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    uid = os.getuid()
    if os.stat(dst).st_uid != uid:
        raise RuntimeError(
            f"fixture dir {dst} is owned by uid {os.stat(dst).st_uid}, "
            f"not {uid} — refusing to write into a pre-created foreign dir"
        )
    # inverse CDF over H(r)/H(V)
    cum, acc = [], 0.0
    for r in range(1, vocab + 1):
        acc += 1.0 / r
        cum.append(acc)
    total = cum[-1]
    ids, texts, n_chars = [], [], []
    for d in range(n_docs):
        n_tok = 30 + int(_u(d, -1) * 40)  # 30..69 words
        words = []
        for j in range(n_tok):
            r = bisect.bisect_left(cum, _u(d, j) * total) + 1
            words.append(f"w{r}")
        t = " ".join(words)
        ids.append(d)
        texts.append(t)
        n_chars.append(len(t))
    stage = os.path.join(dst, f"documents.parquet.__stage_{os.getpid()}__")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n_docs, pa.string()),
                "source": pa.array(
                    [("web", "books", "code")[i % 3] for i in range(n_docs)],
                    pa.string(),
                ),
                "n_chars": pa.array(n_chars, pa.int64()),
            }
        ),
        stage,
    )
    os.replace(stage, os.path.join(dst, "documents.parquet"))
    return dst


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from itdb_spark.queries import load_all
    from itdb_spark.queries.pipeline import corpus
    from itdb_spark.session import default_parallelism, get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 30000
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/itdb_spark_zipf"
    build_zipf_docs(dst, n_docs, vocab)

    spark = get_spark("zipf_allpairs_bench", cpus=default_parallelism())
    reg = load_all()

    # candidate-pair count from the prefix join (the dedup-allpairs
    # recipe up to the distinct candidate frame)
    c = corpus(spark, dst)
    toks = (
        c.where(F.length(F.trim("text")) > 0)
        .select(
            F.col("doc_id").alias("doc"),
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w"),
        )
        .distinct()
    )
    df_ = toks.groupBy("w").agg(F.count("*").alias("df"))
    ranked = (
        toks.join(df_, "w")
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("doc").orderBy("df", "w")),
        )
        .withColumn("nt", F.count("*").over(Window.partitionBy("doc")))
    )
    prefix = ranked.where(
        F.col("rn") <= F.col("nt") - F.expr("(7 * nt + 9) DIV 10") + 1
    ).select("doc", "w")
    n_corpus = c.count()
    t0 = time.perf_counter()
    n_cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "w")
        .where(F.col("a.doc") < F.col("b.doc"))
        .select("a.doc", "b.doc")
        .distinct()
        .count()
    )
    t_cand = time.perf_counter() - t0

    def timed(qid):
        t0 = time.perf_counter()
        n = reg[qid].spark(spark, dst).count()
        return round(time.perf_counter() - t0, 2), n

    t_all, n_all = timed("dedup-allpairs")
    t_lsh, n_lsh = timed("dedup-jaccard")

    # round 10: the asymmetric containment join's candidate fraction +
    # full-query wall on the same corpus (small-side prefix × full
    # inverted index over 3-gram SHINGLE sets — structurally more
    # candidates than the symmetric prefix×prefix join; on Zipfian df
    # shingle frequencies are ~1 so candidates collapse to the true
    # pairs, measured 0.07%/0.01% — tests/test_wave10.py pins <= 2%)
    from itdb_spark.operators.dedup import (
        containment_candidates,
        shingle_frame,
    )

    t0 = time.perf_counter()
    n_ccand = containment_candidates(shingle_frame(c, "doc_id", "text")).count()
    t_ccand = time.perf_counter() - t0
    t_ct, n_ct = timed("dedup-contain-exact")

    quad = n_corpus * (n_corpus - 1) // 2
    print(
        json.dumps(
            {
                "n_docs_corpus": n_corpus,
                "vocab": vocab,
                "quadratic_pairs": quad,
                "prefix_candidates": n_cand,
                "candidate_fraction": round(n_cand / quad, 6),
                "t_candidates_sec": round(t_cand, 2),
                "allpairs_sec": t_all,
                "allpairs_pairs": n_all,
                "jaccard_lsh_sec": t_lsh,
                "jaccard_lsh_pairs": n_lsh,
                "contain_candidates": n_ccand,
                "contain_candidate_fraction": round(n_ccand / quad, 6),
                "t_contain_candidates_sec": round(t_ccand, 2),
                "contain_exact_sec": t_ct,
                "contain_exact_pairs": n_ct,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
