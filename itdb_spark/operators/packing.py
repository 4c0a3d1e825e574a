"""Sequence packing for LLM pretraining batches: concatenate documents in
a deterministic order and slice the token stream into fixed-budget packs
(the standard concat-and-chunk layout — every pack is exactly ``budget``
tokens except the last, documents may straddle pack boundaries).

Packing semantics choice: concat-and-chunk is the form that scales.
True greedy bin packing (next-fit/first-fit: close a bin when the next
document would overflow) carries sequential state per bin — inherently a
single-threaded scan, unshardable without changing its output. The
concat-and-chunk form is a pure function of the exclusive token cumsum,
which the ranged two-phase pattern (plans/library.ranged_cumsum)
computes with NO single-partition exchange — so the same plan packs a
100 TB corpus. (The reference has no packing analog; this is one of the
training-data extensions the engine adds, COVERAGE.md.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from itdb_spark.plans.library import ranged_cumsum


def pack_sequences(
    docs: DataFrame,
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    bucket=None,
) -> DataFrame:
    """(order_col, n_tokens, pack_id, pack_offset) for every document:

    * ``pack_id``   — which fixed-``budget`` pack the document STARTS in
                      (floor(cumsum_before / budget));
    * ``pack_offset`` — token position within that pack
                      (cumsum_before mod budget).

    A document with pack_offset + n_tokens > budget straddles into the
    next pack(s) — the trainer's chunker handles the split; the pack
    boundaries themselves are deterministic and order-reproducible, so a
    SQL oracle (one window cumsum) can verify the assignment exactly.
    """
    cum = ranged_cumsum(
        docs, [order_col], tokens_col, out_col="_cb", bucket=bucket
    )
    return cum.select(
        order_col,
        F.col(tokens_col).cast("long").alias(tokens_col),
        F.floor(F.col("_cb") / budget).cast("long").alias("pack_id"),
        (F.col("_cb") % budget).cast("long").alias("pack_offset"),
    )


def pack_chunks(
    docs: DataFrame,
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    bucket=None,
) -> DataFrame:
    """The chunk-split expansion of ``pack_sequences`` — what the trainer
    actually consumes: one row per (document, pack) a document touches,
    with the slice geometry

    * ``slice_start`` — first token of the doc that lands in this pack;
    * ``slice_len``  — how many of the doc's tokens this pack takes.

    A doc spanning packs p0..p1 explodes into p1−p0+1 rows (bounded by
    ceil(n_tokens/budget)+1 — long docs fan out proportionally to their
    own length, never to corpus size). Invariants (unit-tested): per-doc
    Σ slice_len = n_tokens; per-pack Σ slice_len = budget for every pack
    except the last.

    Zero-token docs emit NO chunk rows (filtered before the explode):
    with n <= 0 and cumsum_before on a pack boundary, p1 < p0 and
    F.sequence(p0, p1) would generate a DESCENDING two-element sequence —
    spurious rows with slice_len <= 0 that a SQL generate_series oracle
    (empty for p1 < p0) never emits. They still participate in the
    cumsum; contributing 0 tokens, they shift nothing."""
    cum = ranged_cumsum(docs, [order_col], tokens_col, out_col="_cb", bucket=bucket)
    n = F.col(tokens_col).cast("long")
    cb = F.col("_cb")
    p0 = F.floor(cb / budget).cast("long")
    p1 = F.floor((cb + n - 1) / budget).cast("long")
    exploded = cum.where(n > 0).select(
        order_col,
        n.alias("_n"),
        cb.alias("_cbv"),
        F.explode(F.sequence(p0, p1)).alias("pack_id"),
    )
    pack_lo = F.col("pack_id") * budget
    pack_hi = (F.col("pack_id") + 1) * budget
    start_tok = F.greatest(F.col("_cbv"), pack_lo)
    end_tok = F.least(F.col("_cbv") + F.col("_n"), pack_hi)
    return exploded.select(
        order_col,
        "pack_id",
        (start_tok - F.col("_cbv")).cast("long").alias("slice_start"),
        (end_tok - start_tok).cast("long").alias("slice_len"),
    )


BPE_MERGES = (
    "t h", "h e", "i n", "e r", "a n", "r e", "o n", "a t", "e n", "n d",
    "e s", "o r", "t e", "e d", "i s", "i t", "a l", "a r", "s t", "t o",
    "th e", "in g", "an d", "er s",
)


def bpe_segment(word: str, merges: tuple[str, ...] = BPE_MERGES) -> list[str]:
    """GPT-2-style BPE application with a fixed merge table: repeatedly
    merge the FIRST occurrence of the lowest-rank adjacent pair until no
    pair is in the table. First-occurrence-per-step is equivalent to the
    usual merge-all-occurrences-left-to-right: while the best pair is
    still present it stays the best (ranks are fixed; equal rank means
    the same pair), so successive steps sweep its occurrences left to
    right before any other pair can move."""
    syms = list(word)
    rank = {m: i for i, m in enumerate(merges)}
    while len(syms) > 1:
        best_i, best_r = -1, len(merges)
        for i in range(len(syms) - 1):
            r = rank.get(syms[i] + " " + syms[i + 1], len(merges))
            if r < best_r:
                best_i, best_r = i, r
        if best_i < 0 or best_r >= len(merges):
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms
