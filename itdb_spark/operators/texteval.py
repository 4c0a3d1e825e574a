"""Text-pair evaluation: ROUGE-n overlap metrics over (candidate,
reference) document pairs — the summarization/eval-harness counterpart
of the retrieval metrics in operators/retrieval.py (Lin, "ROUGE: A
Package for Automatic Evaluation of Summaries", ACL 2004 workshop).
Training-data pipelines run exactly this shape for decontamination
scoring (candidate training doc vs benchmark reference) and for
eval-set regression tracking.

Scale shape: each side's n-grams explode ONCE; both sides union into a
single (pair, gram)-keyed groupBy (one shuffle carries only gram
postings), and the clipped-overlap aggregation is a second bounded
groupBy on pair_id. No join back to the corpus, no cross join anywhere.

Exactness: every metric is integer micro-unit arithmetic on BIGINT
counts — precision = 1e6·overlap div n_cand, recall = 1e6·overlap div
n_ref, and F1 uses the count-level identity 2·overlap/(n_cand + n_ref)
(the harmonic mean of count-ratios), so F1 is a SINGLE integer floor
division, never a compounding of two rounded ratios. Empty sides yield
0, not NULL/crash (division guards), and a DuckDB oracle reproduces
every value bit-for-bit with `//`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from itdb_spark.catalog import EDGE_ID_FLOOR
from itdb_spark.functions.core import bind_once


def _gram_col(text: Column, n: int) -> Column:
    """Multiset of lowercase word n-grams as array<string> (duplicates
    preserved — ROUGE clips on COUNTS, not distinct grams). Empty or
    too-short texts yield an empty array."""
    toks = F.array_remove(F.split(F.lower(F.trim(text)), r"\s+"), "")
    if n == 1:
        return toks
    # adjacent n-token windows via transform over the valid start range;
    # the token array is bound ONCE (bind_once, r14): referenced inline,
    # the split+array_remove re-ran per element × n element_at refs —
    # O(tokens²) per doc (the word_shingles hazard)
    return bind_once(
        toks,
        lambda t: F.when(
            F.size(t) < n, F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size(t) - n),
                lambda i: F.concat_ws(
                    " ",
                    *[F.element_at(t, (i + j + 1).cast("int")) for j in range(n)],
                ),
            )
        ),
    )


def rouge_n(
    pairs: DataFrame,
    n: int = 1,
    pair_col: str = "pair_id",
    cand_col: str = "cand_text",
    ref_col: str = "ref_text",
) -> DataFrame:
    """Per-pair ROUGE-n: (pair_id, n_cand, n_ref, overlap, p_micros,
    r_micros, f1_micros). Overlap is the clipped multiset intersection
    Σ_g min(count_cand(g), count_ref(g)) — the ROUGE definition."""
    cand = pairs.select(
        F.col(pair_col).alias("pair_id"),
        F.explode_outer(_gram_col(F.col(cand_col), n)).alias("gram"),
        F.lit(1).alias("c"),
        F.lit(0).alias("r"),
    )
    ref = pairs.select(
        F.col(pair_col).alias("pair_id"),
        F.explode_outer(_gram_col(F.col(ref_col), n)).alias("gram"),
        F.lit(0).alias("c"),
        F.lit(1).alias("r"),
    )
    # explode_outer keeps empty-gram pairs alive as NULL-gram rows with
    # zero contribution, so every input pair emits an output row
    counts = (
        cand.unionByName(ref)
        .groupBy("pair_id", "gram")
        .agg(
            F.sum(F.when(F.col("gram").isNotNull(), F.col("c")).otherwise(0))
            .cast("long").alias("nc"),
            F.sum(F.when(F.col("gram").isNotNull(), F.col("r")).otherwise(0))
            .cast("long").alias("nr"),
        )
    )
    per_pair = counts.groupBy("pair_id").agg(
        F.sum("nc").cast("long").alias("n_cand"),
        F.sum("nr").cast("long").alias("n_ref"),
        F.sum(F.least("nc", "nr")).cast("long").alias("overlap"),
    )
    z = F.lit(0).cast("long")
    return per_pair.select(
        "pair_id",
        "n_cand",
        "n_ref",
        "overlap",
        F.when(F.col("n_cand") > 0,
               F.expr("overlap * 1000000 div n_cand")).otherwise(z)
        .cast("long").alias("p_micros"),
        F.when(F.col("n_ref") > 0,
               F.expr("overlap * 1000000 div n_ref")).otherwise(z)
        .cast("long").alias("r_micros"),
        F.when(F.col("n_cand") + F.col("n_ref") > 0,
               F.expr("2 * overlap * 1000000 div (n_cand + n_ref)")).otherwise(z)
        .cast("long").alias("f1_micros"),
    )


def rouge_oracle_sql(
    n: int = 1,
    n_pairs: int = 30,
) -> str:
    """DuckDB twin of rouge_n over consecutive-document pairs from the
    documents table (candidate = doc d, reference = doc d+1, d <
    n_pairs, PLUS any consecutive pairs among ids >= EDGE_ID_FLOOR —
    the edge corpus's planted degenerate docs are consecutive up there,
    so the adversarial sweep genuinely exercises ROUGE's empty/
    whitespace/unicode/CJK paths while normal testdata is unaffected;
    the floor is the shared itdb_spark.catalog.EDGE_ID_FLOOR constant,
    and the invariants gate keeps real testdata below it) — the
    deterministic pairing the eval-rouge registry entry uses. Mirrors
    the multiset-clip and the integer `div` arithmetic."""
    if n == 1:
        grams = "toks"
    else:
        grams = f"""CASE WHEN len(toks) < {n} THEN []
            ELSE list_transform(range(0, len(toks) - {n} + 1),
                 i -> array_to_string(list_slice(toks, i + 1, i + {n}), ' '))
            END"""
    return f"""
    WITH pairs AS (
      SELECT c.doc_id AS pair_id, c.text AS cand_t, r.text AS ref_t
      FROM documents c JOIN documents r ON r.doc_id = c.doc_id + 1
      WHERE c.doc_id < {n_pairs} OR c.doc_id >= {EDGE_ID_FLOOR}
    ),
    sides AS (
      SELECT pair_id, cand_t AS t, 1 AS c, 0 AS r FROM pairs
      UNION ALL
      SELECT pair_id, ref_t AS t, 0 AS c, 1 AS r FROM pairs
    ),
    toksed AS (
      SELECT pair_id, c, r,
             list_filter(regexp_split_to_array(lower(trim(t)), '\\s+'),
                         x -> x != '') AS toks
      FROM sides
    ),
    grams AS (
      SELECT pair_id, c, r, unnest({grams}) AS gram FROM toksed
    ),
    counts AS (
      SELECT pair_id, gram,
             CAST(sum(c) AS BIGINT) AS nc, CAST(sum(r) AS BIGINT) AS nr
      FROM grams GROUP BY 1, 2
    ),
    per_pair AS (
      SELECT p.pair_id,
             CAST(coalesce(sum(nc), 0) AS BIGINT) AS n_cand,
             CAST(coalesce(sum(nr), 0) AS BIGINT) AS n_ref,
             CAST(coalesce(sum(least(nc, nr)), 0) AS BIGINT) AS overlap
      FROM pairs p LEFT JOIN counts ct ON ct.pair_id = p.pair_id
      GROUP BY 1
    )
    SELECT pair_id, n_cand, n_ref, overlap,
           CAST(CASE WHEN n_cand > 0
                THEN overlap * 1000000 // n_cand ELSE 0 END AS BIGINT)
             AS p_micros,
           CAST(CASE WHEN n_ref > 0
                THEN overlap * 1000000 // n_ref ELSE 0 END AS BIGINT)
             AS r_micros,
           CAST(CASE WHEN n_cand + n_ref > 0
                THEN 2 * overlap * 1000000 // (n_cand + n_ref) ELSE 0 END
                AS BIGINT) AS f1_micros
    FROM per_pair
    """


def bleu_counts(
    pairs: DataFrame,
    max_n: int = 4,
    pair_col: str = "pair_id",
    cand_col: str = "cand_text",
    ref_col: str = "ref_text",
) -> DataFrame:
    """Per-pair BLEU component counts (Papineni et al., "BLEU", ACL
    2002): for n = 1..max_n the CLIPPED n-gram match count m{n} =
    Σ_g min(count_cand(g), count_ref(g)) and the candidate total t{n},
    plus token lengths c_len / r_len (the brevity-penalty inputs) and
    modified precisions p{n}_micros = 1e6·m{n} div t{n}. Everything a
    BLEU consumer folds (geometric mean + BP = exp(min(0, 1−r/c))) is
    a trivial driver-side op over these integers; the irrational
    exp/log stays OUT of the relation so both engines hash-match
    bit-for-bit — the eval-rouge integer-micros discipline.

    Scale shape: each side's text tokenizes ONCE and emits all max_n
    gram levels from that one pass (a concat of per-level transforms →
    ONE explode), both sides union into a single (pair, n, gram)-keyed
    groupBy — one gram-postings shuffle exactly like rouge_n, then two
    bounded per-pair aggregations. No join back to the corpus.
    """
    def side(col: str, cm: int, rm: int) -> DataFrame:
        toks = F.array_remove(
            F.split(F.lower(F.trim(F.col(col))), r"\s+"), "")
        def tag(n: int):
            # single-arg lambda: a two-arg lambda would receive the
            # ELEMENT INDEX as its second argument (F.transform's
            # (element, index) form) and clobber the level tag
            return lambda g: F.struct(F.lit(n).alias("n"),
                                      g.alias("gram"))

        levels = [
            F.transform(_gram_col(F.col(col), n), tag(n))
            for n in range(1, max_n + 1)
        ]
        return pairs.select(
            F.col(pair_col).alias("pair_id"),
            F.size(toks).alias("toks"),
            F.explode_outer(F.concat(*levels)).alias("ng"),
        ).select(
            "pair_id",
            "toks",
            F.col("ng.n").alias("n"),
            F.col("ng.gram").alias("gram"),
            F.lit(cm).alias("c"),
            F.lit(rm).alias("r"),
        )

    cand = side(cand_col, 1, 0)
    ref = side(ref_col, 0, 1)
    # explode_outer keeps gramless pairs alive (NULL n/gram, zero
    # contribution) so every input pair emits an output row
    counts = (
        cand.unionByName(ref)
        .groupBy("pair_id", "n", "gram")
        .agg(
            F.sum(F.when(F.col("gram").isNotNull(), F.col("c"))
                  .otherwise(0)).cast("long").alias("nc"),
            F.sum(F.when(F.col("gram").isNotNull(), F.col("r"))
                  .otherwise(0)).cast("long").alias("nr"),
            # token length rides the gram rows: max() of a per-pair
            # constant; the c/r marker scopes it to the owning side
            F.max(F.when(F.col("c") == 1, F.col("toks"))).alias("ct"),
            F.max(F.when(F.col("r") == 1, F.col("toks"))).alias("rt"),
        )
    )
    per_n = counts.groupBy("pair_id", "n").agg(
        F.sum(F.least("nc", "nr")).cast("long").alias("m"),
        F.sum("nc").cast("long").alias("t"),
        F.max("ct").alias("ct"),
        F.max("rt").alias("rt"),
    )
    z = F.lit(0).cast("long")
    agg_cols = [
        F.coalesce(F.max("ct"), z).cast("long").alias("c_len"),
        F.coalesce(F.max("rt"), z).cast("long").alias("r_len"),
    ]
    for n in range(1, max_n + 1):
        agg_cols += [
            F.coalesce(F.sum(F.when(F.col("n") == n, F.col("m"))), z)
            .cast("long").alias(f"m{n}"),
            F.coalesce(F.sum(F.when(F.col("n") == n, F.col("t"))), z)
            .cast("long").alias(f"t{n}"),
        ]
    out = per_n.groupBy("pair_id").agg(*agg_cols)
    prec = [
        F.when(F.col(f"t{n}") > 0,
               F.expr(f"m{n} * 1000000 div t{n}")).otherwise(z)
        .cast("long").alias(f"p{n}_micros")
        for n in range(1, max_n + 1)
    ]
    return out.select("pair_id", "c_len", "r_len",
                      *[c for n in range(1, max_n + 1)
                        for c in (f"m{n}", f"t{n}")],
                      *prec)


def bleu_oracle_sql(max_n: int = 4, n_pairs: int = 30) -> str:
    """DuckDB twin of bleu_counts over the same consecutive-document
    pairing as rouge_oracle_sql (candidate = doc d, reference = doc
    d+1, d < n_pairs plus the edge corpus's planted pairs at ids >=
    EDGE_ID_FLOOR). One MATERIALIZED tokenization feeds all max_n gram
    levels (UNION ALL branches — linear, not chained, but MATERIALIZED
    still stops DuckDB re-tokenizing per branch); lengths come straight
    from the token arrays, never from gram rows, so fully-empty pairs
    keep exact zero counts through the final LEFT JOIN."""
    def gram_branch(n: int) -> str:
        if n == 1:
            grams = "toks"
        else:
            grams = f"""CASE WHEN len(toks) < {n} THEN []
                ELSE list_transform(range(0, len(toks) - {n} + 1),
                     i -> array_to_string(list_slice(toks, i + 1, i + {n}), ' '))
                END"""
        return f"""SELECT pair_id, c, r, {n} AS n,
                   unnest({grams}) AS gram FROM toksed"""

    branches = "\n      UNION ALL\n      ".join(
        gram_branch(n) for n in range(1, max_n + 1))
    m_cols = ",\n           ".join(
        f"""CAST(coalesce(sum(CASE WHEN n = {n} THEN m END), 0) AS BIGINT)
               AS m{n},
           CAST(coalesce(sum(CASE WHEN n = {n} THEN t END), 0) AS BIGINT)
               AS t{n}"""
        for n in range(1, max_n + 1))
    p_cols = ",\n           ".join(
        f"""CAST(CASE WHEN t{n} > 0
                THEN m{n} * 1000000 // t{n} ELSE 0 END AS BIGINT)
               AS p{n}_micros"""
        for n in range(1, max_n + 1))
    return f"""
    WITH pairs AS (
      SELECT c.doc_id AS pair_id, c.text AS cand_t, r.text AS ref_t
      FROM documents c JOIN documents r ON r.doc_id = c.doc_id + 1
      WHERE c.doc_id < {n_pairs} OR c.doc_id >= {EDGE_ID_FLOOR}
    ),
    sides AS (
      SELECT pair_id, cand_t AS t, 1 AS c, 0 AS r FROM pairs
      UNION ALL
      SELECT pair_id, ref_t AS t, 0 AS c, 1 AS r FROM pairs
    ),
    toksed AS MATERIALIZED (
      SELECT pair_id, c, r,
             list_filter(regexp_split_to_array(lower(trim(t)), '\\s+'),
                         x -> x != '') AS toks
      FROM sides
    ),
    lengths AS (
      SELECT pair_id,
             CAST(coalesce(max(CASE WHEN c = 1 THEN len(toks) END), 0)
                  AS BIGINT) AS c_len,
             CAST(coalesce(max(CASE WHEN r = 1 THEN len(toks) END), 0)
                  AS BIGINT) AS r_len
      FROM toksed GROUP BY 1
    ),
    grams AS (
      {branches}
    ),
    counts AS (
      SELECT pair_id, n, gram,
             CAST(sum(c) AS BIGINT) AS nc, CAST(sum(r) AS BIGINT) AS nr
      FROM grams GROUP BY 1, 2, 3
    ),
    per_n AS (
      SELECT pair_id, n,
             CAST(sum(least(nc, nr)) AS BIGINT) AS m,
             CAST(sum(nc) AS BIGINT) AS t
      FROM counts GROUP BY 1, 2
    ),
    folded AS (
      SELECT l.pair_id, l.c_len, l.r_len,
           {m_cols}
      FROM lengths l LEFT JOIN per_n pn ON pn.pair_id = l.pair_id
      GROUP BY 1, 2, 3
    )
    SELECT pair_id, c_len, r_len,
           {", ".join(f"m{n}, t{n}" for n in range(1, max_n + 1))},
           {p_cols}
    FROM folded
    """


def _char_gram_col(text: Column, n: int) -> Column:
    """Multiset of character n-grams over the WHITESPACE-STRIPPED
    lowercase text (chrF operates on characters with spaces removed —
    Popović 2015 §2). Too-short strings yield an empty array."""
    s = F.regexp_replace(F.lower(text), r"\s+", "")
    if n == 1:
        # split-to-chars keeps this the cheap path
        return F.filter(F.split(s, ""), lambda c: c != F.lit(""))
    # bind the stripped string ONCE (bind_once, r14): referenced inline,
    # the whole-text regexp_replace re-ran per extracted gram — O(chars²)
    # per doc per n
    return bind_once(
        s,
        lambda ss: F.when(
            F.length(ss) < n, F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.length(ss) - n + 1),
                lambda i: ss.substr(i, F.lit(n)),
            )
        ),
    )


def chrf_counts(
    pairs: DataFrame,
    max_n: int = 6,
    pair_col: str = "pair_id",
    cand_col: str = "cand_text",
    ref_col: str = "ref_text",
) -> DataFrame:
    """Per-(pair, n) chrF component counts (Popović, "chrF: character
    n-gram F-score", WMT 2015): clipped character-n-gram matches m,
    candidate total tc, reference total tr for n = 1..max_n, plus
    integer-micro precision/recall and the chrF2 per-n F-score via the
    count-level identity F2 = (1+2^2)PR/(2^2·P+R) = 5m/(4·tr + tc) —
    ONE integer floor division, the rouge_n F1 discipline extended to
    beta=2. The cross-n average a chrF consumer reports is a bounded
    driver-side fold over these 6 rows per pair; keeping rows per n
    (long form) rather than 20 wide columns keeps every value exact
    and the relation mergeable.

    Scale shape mirrors bleu_counts: each side's character string is
    built once and all max_n gram levels leave through ONE explode
    (level-tagged concat), then a single (pair, n, gram)-keyed
    map-side-combined shuffle and a bounded per-(pair, n) fold; the
    (pair x n) output grid is densified from the pairs frame itself so
    degenerate texts keep explicit zero rows."""
    def side(col: str, cm: int, rm: int) -> DataFrame:
        def tag(n: int):
            # single-arg closure: F.transform's two-arg form binds the
            # element index as the second argument (see bleu_counts)
            return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

        levels = [
            F.transform(_char_gram_col(F.col(col), n), tag(n))
            for n in range(1, max_n + 1)
        ]
        return pairs.select(
            F.col(pair_col).alias("pair_id"),
            F.explode_outer(F.concat(*levels)).alias("ng"),
        ).select(
            "pair_id",
            F.col("ng.n").alias("n"),
            F.col("ng.gram").alias("gram"),
            F.lit(cm).alias("c"),
            F.lit(rm).alias("r"),
        )

    counts = (
        side(cand_col, 1, 0)
        .unionByName(side(ref_col, 0, 1))
        .where(F.col("gram").isNotNull())
        .groupBy("pair_id", "n", "gram")
        .agg(
            F.sum("c").cast("long").alias("nc"),
            F.sum("r").cast("long").alias("nr"),
        )
    )
    per_n = counts.groupBy("pair_id", "n").agg(
        F.sum(F.least("nc", "nr")).cast("long").alias("m"),
        F.sum("nc").cast("long").alias("tc"),
        F.sum("nr").cast("long").alias("tr"),
    )
    grid = pairs.select(F.col(pair_col).alias("pair_id")).crossJoin(
        F.broadcast(
            pairs.sparkSession.range(1, max_n + 1).select(
                F.col("id").cast("int").alias("n")
            )
        )
    )
    z = F.lit(0).cast("long")
    dense = grid.join(per_n, ["pair_id", "n"], "left").select(
        "pair_id",
        "n",
        F.coalesce("m", z).alias("m"),
        F.coalesce("tc", z).alias("tc"),
        F.coalesce("tr", z).alias("tr"),
    )
    return dense.select(
        "pair_id",
        F.col("n").cast("long").alias("n"),
        "m",
        "tc",
        "tr",
        F.when(F.col("tc") > 0, F.expr("m * 1000000 div tc")).otherwise(z)
        .cast("long").alias("p_micros"),
        F.when(F.col("tr") > 0, F.expr("m * 1000000 div tr")).otherwise(z)
        .cast("long").alias("r_micros"),
        F.when(4 * F.col("tr") + F.col("tc") > 0,
               F.expr("5 * m * 1000000 div (4 * tr + tc)")).otherwise(z)
        .cast("long").alias("f2_micros"),
    )


def chrf_oracle_sql(max_n: int = 6, n_pairs: int = 30) -> str:
    """DuckDB twin of chrf_counts over the consecutive-document pairing
    shared with rouge/bleu (candidate = doc d, reference = doc d+1,
    d < n_pairs plus the edge corpus's planted pairs at ids >=
    EDGE_ID_FLOOR). One MATERIALIZED space-strip feeds all gram levels;
    the (pair x n) grid densifies through a range() cross join so
    degenerate texts keep zero rows. regexp_replace carries the 'g'
    flag (DuckDB replaces first-match-only by default)."""
    def gram_branch(n: int) -> str:
        if n == 1:
            grams = "list_filter(regexp_split_to_array(s, ''), x -> x != '')"
        else:
            grams = f"""CASE WHEN length(s) < {n} THEN []
                ELSE list_transform(range(1, length(s) - {n} + 2),
                     i -> substr(s, i, {n}))
                END"""
        return f"""SELECT pair_id, c, r, {n} AS n,
                   unnest({grams}) AS gram FROM stripped"""

    branches = "\n      UNION ALL\n      ".join(
        gram_branch(n) for n in range(1, max_n + 1))
    return f"""
    WITH pairs AS (
      SELECT c.doc_id AS pair_id, c.text AS cand_t, r.text AS ref_t
      FROM documents c JOIN documents r ON r.doc_id = c.doc_id + 1
      WHERE c.doc_id < {n_pairs} OR c.doc_id >= {EDGE_ID_FLOOR}
    ),
    sides AS (
      SELECT pair_id, cand_t AS t, 1 AS c, 0 AS r FROM pairs
      UNION ALL
      SELECT pair_id, ref_t AS t, 0 AS c, 1 AS r FROM pairs
    ),
    stripped AS MATERIALIZED (
      SELECT pair_id, c, r,
             regexp_replace(lower(t), '\\s+', '', 'g') AS s
      FROM sides
    ),
    grams AS (
      {branches}
    ),
    counts AS (
      SELECT pair_id, n, gram,
             CAST(sum(c) AS BIGINT) AS nc, CAST(sum(r) AS BIGINT) AS nr
      FROM grams GROUP BY 1, 2, 3
    ),
    per_n AS (
      SELECT pair_id, n,
             CAST(sum(least(nc, nr)) AS BIGINT) AS m,
             CAST(sum(nc) AS BIGINT) AS tc,
             CAST(sum(nr) AS BIGINT) AS tr
      FROM counts GROUP BY 1, 2
    ),
    dense AS (
      SELECT g.pair_id, g.n,
             CAST(coalesce(pn.m, 0) AS BIGINT) AS m,
             CAST(coalesce(pn.tc, 0) AS BIGINT) AS tc,
             CAST(coalesce(pn.tr, 0) AS BIGINT) AS tr
      FROM (SELECT p.pair_id, CAST(n.n AS BIGINT) AS n
            FROM pairs p CROSS JOIN
                 (SELECT unnest(range(1, {max_n + 1})) AS n) n) g
      LEFT JOIN per_n pn ON pn.pair_id = g.pair_id AND pn.n = g.n
    )
    SELECT pair_id, n, m, tc, tr,
           CAST(CASE WHEN tc > 0 THEN m * 1000000 // tc ELSE 0 END
                AS BIGINT) AS p_micros,
           CAST(CASE WHEN tr > 0 THEN m * 1000000 // tr ELSE 0 END
                AS BIGINT) AS r_micros,
           CAST(CASE WHEN 4 * tr + tc > 0
                THEN 5 * m * 1000000 // (4 * tr + tc) ELSE 0 END
                AS BIGINT) AS f2_micros
    FROM dense
    """
