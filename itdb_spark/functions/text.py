"""Text-analysis column helpers for the training-data-pipeline extensions:
tokenization, stopword/quality metrics, n-gram shingles. All built-in
higher-order functions — JVM-side, no Python UDFs."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic English-marker set; a real language-ID model would be a
# per-language n-gram profile, but the heuristic shape (marker-token ratio)
# is the same and is what we can oracle-check.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization → array<string> (empty string → empty array)."""
    c = F.col(text) if isinstance(text, str) else text
    arr = F.split(F.trim(c), r"\s+")
    return F.when(F.length(F.trim(c)) == 0, F.array().cast("array<string>")).otherwise(arr)


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Fraction of tokens that are in the marker set — the language-ID /
    quality heuristic. Uses higher-order ``filter`` so it stays JVM-side."""
    toks = tokens(text)
    marker = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        marker.cast("double") / F.size(toks).cast("double")
    )


# The en/other decision threshold of the language-ID heuristic. Single
# source of truth: text-langid reports this classifier and
# pipe-langid-eval measures it — both Spark sides call langid_predict and
# both oracles interpolate this constant, so tuning it cannot drift the
# evaluation harness away from the classifier it claims to measure.
LANGID_THRESHOLD = 0.05


def langid_predict(text: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """'en'/'other' prediction of the stopword-ratio language-ID
    heuristic — the one shared definition of the classifier."""
    return (
        F.when(stopword_ratio(text, stopwords) >= LANGID_THRESHOLD, F.lit("en"))
        .otherwise(F.lit("other"))
    )


def quality_score(text: Column | str) -> Column:
    """Composite document-quality score: mean word length in a sane band,
    low non-alpha ratio, non-trivial length. Deterministic arithmetic only."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    n_tok = F.size(toks)
    mean_wlen = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)).cast("double")
        / n_tok.cast("double")
    )
    non_alpha = F.length(F.regexp_replace(c, r"[A-Za-z\s]", ""))
    non_alpha_ratio = F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        non_alpha.cast("double") / F.length(c).cast("double")
    )
    len_ok = F.when((n_tok >= 5) & (n_tok <= 10000), F.lit(1.0)).otherwise(F.lit(0.0))
    wlen_ok = F.when((mean_wlen >= 2.0) & (mean_wlen <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round(0.4 * len_ok + 0.3 * wlen_ok + 0.3 * (1.0 - non_alpha_ratio), 6)


def nfc_normalize(text: Column | str) -> Column:
    """Unicode NFC normalization — the ONE place the UDF lives, shared by
    the graded text-normalize query (queries/pipeline.py) and the curate
    CLI (tools/curate.py) so the curation binary and the oracle-checked
    query can never silently diverge on normalization form or NULL
    handling. Arrow-batched pandas UDF (Spark has no JVM-side NFC);
    pandas ``str.normalize`` propagates NULLs as NULLs."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s):
        return s.str.normalize("NFC")

    c = F.col(text) if isinstance(text, str) else text
    return _nfc(c)


def char_ngrams(text_col: str, n: int = 3) -> Column:
    """Distinct character n-gram shingles of the lowercased text →
    array<string>, via ``transform(sequence(...))`` — JVM-side, no UDF.
    Expressed with F.expr because ``substr`` needs a dynamic start offset.
    Guarded: Spark's sequence() runs DESCENDING when stop < start, so
    short strings collapse to a single whole-text shingle. Word-level
    shingles live in operators.dedup.word_shingles (the dedup path)."""
    return F.expr(
        f"CASE WHEN length(lower({text_col})) < {n} THEN array(lower({text_col})) "
        f"ELSE array_distinct(transform(sequence(1, length(lower({text_col})) - {n - 1}),"
        f" i -> substr(lower({text_col}), i, {n}))) END"
    )
