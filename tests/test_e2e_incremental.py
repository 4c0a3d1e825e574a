"""End-to-end incremental curation loop — the daily-ingest shape SCALE.md
describes for dedup-incremental: day 1 builds the persisted LSH band
index and the curated corpus; day 2's batch dedups against the INDEX
(bucket keys only, no pairwise work against the corpus), verified
suspects drop, novel docs append, and the index advances by exactly the
new docs' bands. Everything flows through real parquet writes between
stages — the state lives on disk, not in session caches — and the loop
is idempotent under re-run."""

from __future__ import annotations

import pyspark.sql.functions as F


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bands(docs):
    from itdb_spark.operators.dedup import minhash_bands, minhash_signatures

    return minhash_bands(minhash_signatures(docs, "doc_id", "text"))


def test_incremental_curate_loop(spark, tmp_path):
    day1 = [
        (i, " ".join(f"tok{(i * 31 + j * 7) % 97}" for j in range(40)))
        for i in range(10)
    ]
    corpus_path = str(tmp_path / "corpus")
    index_path = str(tmp_path / "band_index")

    # --- day 1: curate + persist corpus and band index -------------------
    d1 = _corpus(spark, day1)
    d1.write.parquet(corpus_path)
    _bands(d1).write.partitionBy("band").parquet(index_path)

    # --- day 2: 2 near-dups of day-1 docs + 2 novel docs -----------------
    day2 = [
        (100, day1[0][1].split(" ", 1)[1]),            # near-dup of doc 0
        (101, day1[3][1] + " extra"),                  # near-dup of doc 3
        (102, " ".join(f"fresh{j}" for j in range(40))),
        (103, " ".join(f"novel{j}" for j in range(40))),
    ]
    d2 = _corpus(spark, day2)
    from itdb_spark.operators.dedup import band_collision_counts, ngram_jaccard_pairs

    index = spark.read.parquet(index_path)
    new_bands = _bands(d2)
    hits = band_collision_counts(new_bands, index)
    suspect_ids = {r.doc_id for r in hits.collect()}
    assert {100, 101} <= suspect_ids          # recall on the planted dups
    assert not ({102, 103} & suspect_ids)     # novel docs go straight through

    # verification joins suspects against the persisted day-1 corpus only
    day1_corpus = spark.read.parquet(corpus_path)
    suspects = d2.where(F.col("doc_id").isin(*suspect_ids))
    both = day1_corpus.unionByName(suspects)
    cand = (
        suspects.select(F.col("doc_id").alias("id2"))
        .crossJoin(day1_corpus.select(F.col("doc_id").alias("id1")))
    )
    verified = ngram_jaccard_pairs(
        both, "doc_id", "text", threshold=0.5, candidates=cand
    )
    dup_ids = {r.id2 for r in verified.collect()}
    assert dup_ids == {100, 101}

    # --- append the clean docs; advance the index ------------------------
    clean = d2.join(
        spark.createDataFrame([(i,) for i in sorted(dup_ids)], "doc_id long"),
        "doc_id",
        "left_anti",
    )
    clean.write.mode("append").parquet(corpus_path)
    _bands(clean).write.partitionBy("band").mode("append").parquet(index_path)

    corpus_after = spark.read.parquet(corpus_path)
    assert corpus_after.count() == 12                       # 10 + 2 novel
    assert {r.doc_id for r in corpus_after.collect()} == set(range(10)) | {102, 103}
    index_after = spark.read.parquet(index_path)
    # index advanced by exactly the clean docs' bands
    assert index_after.where(F.col("doc").isin(102, 103)).count() == 8  # 2 docs x 4 bands
    assert index_after.where(F.col("doc").isin(100, 101)).count() == 0

    # --- idempotence: re-running day 2 against the advanced index --------
    hits2 = band_collision_counts(_bands(d2), index_after)
    suspects2 = {r.doc_id for r in hits2.collect()}
    # now the novel docs ARE in the index (self-collision), and the dups
    # still collide with day-1 bands — everything is a suspect, nothing
    # appends twice once verification marks 102/103 as exact self-dups
    assert {100, 101, 102, 103} == suspects2
