"""Lexical retrieval: BM25 scoring and top-k search over a tokenized corpus.

The Okapi BM25 ranking function (Robertson & Spärck Jones / the TREC-3
formulation) — the lexical counterpart of operators/similarity.py's
embedding k-NN, and the retrieval stage a training-data pipeline uses for
benchmark decontamination (rank training docs against eval queries) and
retrieval-based quality filtering. Extends the reference's text-match
surface (itunesdb.py track-name LIKE/regex filters) to ranked full-text
search.

Scale design:

* The corpus is tokenized and exploded exactly ONCE (the tf groupBy);
  document length is a per-row expression and the query-term set
  tokenizes only the query docs (query_ids joins the corpus BEFORE any
  explode).
* Query terms BROADCAST (query sets are tiny against a 100 TB corpus —
  brute_force_knn's query-side discipline), and they broadcast TWICE in
  different roles: first the distinct TERM set semi-prunes the tf table,
  then the (query, term) pairs attach query ids to the survivors.
* Document frequency needs no vocabulary-wide aggregate or join: after
  the term-set prune, a COUNT window partitioned by term over the pruned
  tf table IS df (tf is distinct on (doc, term), and pruning by term
  keeps every doc containing a surviving term) — the same
  share-the-exchange trick minhash's hot-bucket cap uses. The
  vocabulary-keyed shuffle carries only tf rows whose term occurs in
  some query, a massive prune at corpus scale.
* Per-term contributions are rounded to integer MICRO-units before the
  per-(query, doc) sum, so the aggregation is exact integer arithmetic —
  associative and commutative — and the result hash cannot depend on
  Spark's partial-aggregation order (a raw double sum over terms would).
* Top-k per query is a rank window with a full deterministic tie-break
  (score desc, doc id asc); Spark rewrites the rn <= k filter into
  WindowGroupLimit, so each partition keeps k rows before the single
  per-query-group exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Okapi BM25 defaults (the Robertson et al. TREC-3 values).
BM25_K1 = 1.2
BM25_B = 0.75


def _tok_array(lt: Column) -> Column:
    """Whitespace tokens of an already-lowercased/trimmed string, with
    empty tokens removed. Java's split keeps the empty strings that
    leading/trailing non-space whitespace produces (trim strips only
    spaces, so 'a b\\n' would otherwise yield ['a','b','']) — array_remove
    drops them, which also maps whitespace-only text to ZERO tokens with
    no special-case guard."""
    return F.array_remove(F.split(lt, r"\s+"), "")


def bm25_scores(
    tf: DataFrame,
    dl: DataFrame,
    query_terms: DataFrame,
    n_docs_avgdl: DataFrame,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Per-(query, doc) BM25 scores in integer micro-units.

    Inputs: ``tf(doc_id, w, tf)`` (distinct on (doc_id, w)),
    ``dl(doc_id, dl)``, ``query_terms(query_id, w)`` (small — broadcast),
    and a ONE-ROW ``n_docs_avgdl(n, avgdl)`` aggregate (arrives as a
    broadcast, never an eager driver-side count job). Document frequency
    is derived internally: the distinct query-term set semi-prunes tf,
    then a count window over the pruned table's term key is exactly df
    for every surviving term. Returns (query_id, neighbor_id,
    score_micros) with score_micros = Σ_terms round(idf · tf_component ·
    1e6) — exact BIGINT summation, so the hash is order-independent.

    idf uses the +1 ("Lucene") smoothing — ln(1 + (N - df + ½)/(df + ½)) —
    which keeps every contribution positive (the raw Robertson idf goes
    negative for df > N/2 stopwords, letting a match LOWER a score).
    """
    terms = query_terms.select("w").distinct()
    pruned = tf.join(F.broadcast(terms), "w")
    with_df = pruned.withColumn(
        "df", F.count("*").over(Window.partitionBy("w")).cast("long")
    )
    matched = (
        with_df.join(F.broadcast(query_terms), "w")
        .where(F.col("doc_id") != F.col("query_id"))
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n_docs_avgdl))
    )
    idf = F.log(
        F.lit(1.0) + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tfc = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    contrib = F.round(idf * tfc * F.lit(1000000.0)).cast("long")
    return (
        matched.select("query_id", F.col("doc_id").alias("neighbor_id"), contrib.alias("c"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("c").cast("long").alias("score_micros"))
    )


def bm25_topk(
    docs: DataFrame,
    query_ids: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k BM25 search: each query doc's distinct terms rank every other
    corpus doc. ``query_ids`` is a one-column frame of ``id_col`` values
    (small — both it and the derived term set broadcast).

    Tokenization is lowercase-whitespace with empty tokens removed
    (functions/text.py::tokens semantics: empty/whitespace text → zero
    tokens, counted in N and avgdl with dl = 0 but emitting no term
    rows).
    """
    lt = docs.select(
        F.col(id_col).alias("doc_id"), F.lower(F.trim(F.col(text_col))).alias("lt")
    )
    toks = lt.where(F.length("lt") > 0).select(
        "doc_id", F.explode(_tok_array(F.col("lt"))).alias("w")
    )
    tf = toks.groupBy("doc_id", "w").agg(F.count("*").cast("long").alias("tf"))
    dl = lt.select("doc_id", F.size(_tok_array(F.col("lt"))).cast("long").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )
    qterms = (
        lt.join(F.broadcast(query_ids.select(F.col(id_col).alias("doc_id"))), "doc_id")
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(_tok_array(F.col("lt"))).alias("w"),
        )
        .distinct()
    )
    scored = bm25_scores(tf, dl, qterms, stats, k1=k1, b=b)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micros"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score_micros")
    )
