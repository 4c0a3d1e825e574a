"""Round-10 wave invariants: dedup-contain-exact (the lossless
small-side prefix-filter containment join — VERDICT r9 #1) and the
Zipf-fixture candidate-fraction bounds (VERDICT r9 #5).

The driver-gate differential (Spark vs the naive-quadratic DuckDB
oracle) is the primary correctness signal; these tests add the two
claims the oracle can't check on driver testdata:

* RECALL on the adversarial corpus that measured the LSH candidate
  stage at 1% — the exact operator must surface 100% of planted
  skewed containments, by construction (lossless prefix filter), and
  a pure-Python exhaustive third engine must agree on the full result
  set (triangulation discipline).
* The SUB-QUADRATIC candidate fraction on realistic Zipfian document
  frequencies — the scaling claim SCALE.md records from
  tools/zipf_allpairs_bench.py, promoted here to a standing CI
  invariant so it regresses like everything else.
"""

from __future__ import annotations

import hashlib
import os
import tempfile


# --- planted skewed-containment corpus (the round-9 boundary corpus) --------
#
# 200 pairs of a 20-token document quoted contiguously inside a
# 200-token document: containment ~1.0, word-3-gram Jaccard ~0.09 —
# exactly the regime where MinHash bands (tuned for the Jaccard
# threshold) measured 1% candidate recall in round 9 (SCALE.md).
# Filler tokens draw from a shared 1,000-word vocabulary via md5
# inverse so document frequencies are realistic (shared tokens exist;
# determinism without RNG state, the zipf_allpairs_bench discipline).

N_PAIRS = 200


def _w(doc: int, pos: int, vocab: int = 1000) -> str:
    h = hashlib.md5(f"contain:{doc}:{pos}".encode()).hexdigest()[:8]
    return f"v{int(h, 16) % vocab}"


def _planted_rows() -> list[tuple[int, str]]:
    rows = []
    for i in range(N_PAIRS):
        small = [_w(i, p) for p in range(20)]
        filler = [_w(i + 10000, p) for p in range(180)]
        # quote lands at a deterministic interior offset
        at = (i * 7) % 160 + 10
        big = filler[:at] + small + filler[at:]
        rows.append((i, " ".join(small)))
        rows.append((i + 100000, " ".join(big)))
    # 5 equal-size pairs: 50 tokens, last token differs → 48 shingles
    # each, 47 shared → containment 47/48 ≈ 0.979; exercises the
    # |A| = |B| tie path (pair generated once, from the smaller id)
    for i in range(5):
        toks = [_w(i + 20000, p) for p in range(49)]
        rows.append((i + 200000, " ".join(toks + ["alpha"])))
        rows.append((i + 300000, " ".join(toks + ["omega"])))
    return rows


def _py_shingles(text: str) -> frozenset[str]:
    toks = text.strip().lower().split()
    if len(toks) < 3:
        return frozenset([" ".join(toks)])
    return frozenset(
        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
    )


def _py_containment_pairs(
    rows: list[tuple[int, str]], t_num: int = 8, t_den: int = 10
) -> dict[tuple[int, int], tuple[int, int, int]]:
    """Exhaustive pure-Python third engine: (id1, id2) -> (inter, small,
    contain_milli) for every pair at containment >= t."""
    sets = {d: _py_shingles(t) for d, t in rows}
    ids = sorted(sets)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            small = min(len(sets[a]), len(sets[b]))
            if t_den * inter >= t_num * small:
                out[(a, b)] = (inter, small, 1000 * inter // small)
    return out


def test_containment_join_full_recall_on_planted_skew(spark):
    """The corpus that measured the shared MinHash candidate stage at 1%
    recall (round 9) must come back 100% from the exact prefix-filter
    route — every planted (small, big) pair, containment exactly 1000
    milli — and the FULL result set must equal the pure-Python
    exhaustive computation (no spurious pairs, tie pairs included)."""
    from itdb_spark.operators.dedup import containment_join

    rows = _planted_rows()
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id1, r.id2): (r.inter, r.small, r.contain_milli)
        for r in containment_join(docs, "doc_id", "text").collect()
    }
    planted = {(i, i + 100000) for i in range(N_PAIRS)}
    found = planted & set(got)
    assert len(found) == N_PAIRS, (
        f"exact containment recall {len(found)}/{N_PAIRS} on the corpus "
        "that measured LSH at 1% — the lossless route must be 100%"
    )
    for p in planted:
        inter, small, milli = got[p]
        assert inter == small and milli == 1000, (p, got[p])
    # tie path: both equal-size planted pairs present (generated once)
    for i in range(5):
        assert (i + 200000, i + 300000) in got
    # triangulation: full set equality vs the python exhaustive engine
    assert got == _py_containment_pairs(rows)


def test_minhash_candidates_still_miss_planted_skew(spark):
    """Regression pin on the round-9 boundary itself: the Jaccard-tuned
    LSH candidate stage surfaces <20% of the planted skewed
    containments (measured 1%). If this ever jumps, the measured
    justification for dedup-contain-exact's existence — and
    dedup-contain's documented recall caveat — needs re-deriving."""
    from itdb_spark.operators.dedup import minhash_candidates

    rows = [r for r in _planted_rows() if r[0] < 200000]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cands = {
        (r.id1, r.id2)
        for r in minhash_candidates(docs, "doc_id", "text").collect()
    }
    planted = {(i, i + 100000) for i in range(N_PAIRS)}
    hit = len(planted & cands)
    assert hit < N_PAIRS * 0.2, (
        f"LSH candidate recall on skewed containments rose to "
        f"{hit}/{N_PAIRS} — re-measure the SCALE.md boundary"
    )


def test_contain_exact_superset_of_lsh_bounded_contain(spark):
    """Cross-query consistency on driver testdata: every pair the
    LSH-bounded dedup-contain reports at >= 0.8 must appear in
    dedup-contain-exact — WHEN both are computed over the same shingle
    universe. dedup-contain scores unigram token sets (its registered
    definition); here we run its candidate stage + the exact scorer on
    shingles, i.e. exact(candidates ∩ truth) ⊆ exact(truth)."""
    from itdb_spark.operators.dedup import (
        containment_join,
        minhash_candidates,
        shingle_frame,
    )
    from itdb_spark.queries.pipeline import corpus
    from tests.conftest import SF_DIR

    c = corpus(spark, SF_DIR)
    exact = {
        (r.id1, r.id2): (r.inter, r.small)
        for r in containment_join(c, "doc_id", "text").collect()
    }
    # LSH-bounded twin over the same (shingle) universe
    import pyspark.sql.functions as F

    cands = minhash_candidates(c, "doc_id", "text").select("id1", "id2")
    sh = shingle_frame(c, "doc_id", "text")
    sets = sh.groupBy("doc").agg(
        F.sort_array(F.collect_list("w")).alias("ts"),
        F.count("*").cast("long").alias("n"),
    )
    bounded = (
        cands.join(
            sets.select(
                F.col("doc").alias("id1"),
                F.col("ts").alias("ts1"),
                F.col("n").alias("n1"),
            ),
            "id1",
        )
        .join(
            sets.select(
                F.col("doc").alias("id2"),
                F.col("ts").alias("ts2"),
                F.col("n").alias("n2"),
            ),
            "id2",
        )
        .select(
            "id1",
            "id2",
            F.size(F.array_intersect("ts1", "ts2")).cast("long").alias("inter"),
            F.least("n1", "n2").alias("small"),
        )
        .where(10 * F.col("inter") >= 8 * F.col("small"))
        .collect()
    )
    assert len(bounded) > 0  # the candidate stage does find the easy ones
    for r in bounded:
        key = (min(r.id1, r.id2), max(r.id1, r.id2))
        assert key in exact, f"LSH-bounded pair {key} missing from exact"
        assert exact[key] == (r.inter, r.small), key


# --- Zipf fixture: candidate-fraction invariants (VERDICT r9 #5) ------------


def test_zipf_candidate_fraction_bounds(spark):
    """Standing-fixture form of tools/zipf_allpairs_bench.py: on the
    deterministic Zipf(s=1) corpus (1,000 base docs, 10,000-word
    vocabulary → 3,000 after the corpus() derivation), the prefix
    filters must keep the candidate space FAR below quadratic:

    * dedup-allpairs (symmetric Jaccard 0.7 prefix×prefix join over
      unigram token sets): measured 1.96% at this point (round-9 points
      were 0.71–2.02%) — pin <= 4%.
    * dedup-contain-exact (asymmetric small-side prefix × full index,
      over word-3-gram SHINGLE sets): measured 0.07% here and 0.01% at
      the 15,000-doc point — candidates are EXACTLY the planted
      near/exact-dup relations, zero false candidates, because Zipfian
      shingle df is ~1 so each prefix probe only reaches a doc's own
      variants. The asymmetric join's structural extra cost (no
      index-side prefix) is paid in the saturated-vocabulary regime,
      not here. Pin <= 2%.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from itdb_spark.operators.dedup import (
        containment_candidates,
        shingle_frame,
    )
    from itdb_spark.queries.pipeline import corpus
    from tools.zipf_allpairs_bench import build_zipf_docs

    # uid-suffixed per the shared-/tmp discipline (round-10 ADVICE — the
    # bare name is world-predictable); build_zipf_docs additionally
    # verifies dir ownership and writes stage+os.replace
    dst = build_zipf_docs(
        os.path.join(
            tempfile.gettempdir(), f"itdb_spark_zipf_ci_{os.getuid()}"
        ),
        1000,
        10000,
    )
    c = corpus(spark, dst)
    n_docs = c.count()
    quad = n_docs * (n_docs - 1) // 2

    # allpairs candidate count (unigram token sets, Jaccard 0.7 prefix)
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
    ap_cands = (
        prefix.alias("a")
        .join(prefix.alias("b"), "w")
        .where(F.col("a.doc") < F.col("b.doc"))
        .select("a.doc", "b.doc")
        .distinct()
        .count()
    )
    assert ap_cands / quad <= 0.04, (
        f"allpairs candidate fraction {ap_cands}/{quad} = "
        f"{ap_cands / quad:.2%} exceeded the Zipf-fixture bound"
    )

    # containment candidate count (shingle sets, small-side prefix)
    ct_cands = containment_candidates(
        shingle_frame(c, "doc_id", "text")
    ).count()
    assert ct_cands / quad <= 0.02, (
        f"containment candidate fraction {ct_cands}/{quad} = "
        f"{ct_cands / quad:.2%} exceeded the Zipf-fixture bound"
    )


# --- wave-2 third-engine triangulations (the test_wave9 discipline:
# two engines can share a spec misreading; an independent pure-Python /
# numpy reimplementation rarely shares it with both) -------------------


def test_contain_cluster_matches_python_election(spark):
    """dedup-contain-cluster's drop/keep election vs a pure-Python
    exhaustive computation on the planted corpus: same dropped set,
    same keeper attribution (largest container, tie smallest id), same
    container counts."""
    from itdb_spark.operators.dedup import containment_join
    import pyspark.sql.functions as F

    rows = _planted_rows()
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sizes = {d: len(_py_shingles(t)) for d, t in rows}

    # python election over the exhaustive truth
    truth = _py_containment_pairs(rows)
    py = {}
    for (a, b), _ in truth.items():
        na, nb = sizes[a], sizes[b]
        if na < nb:
            dropped, keeper, kn = a, b, nb
        elif nb < na:
            dropped, keeper, kn = b, a, na
        else:
            dropped, keeper, kn = max(a, b), min(a, b), na
        cur = py.setdefault(dropped, [0, None])
        cur[0] += 1
        if cur[1] is None or (kn, -keeper) > (cur[1][0], -cur[1][1]):
            cur[1] = (kn, keeper)
    expected = {d: (v[1][1], v[0]) for d, v in py.items()}

    # spark: same election over the same frame (the registered query's
    # construction, minus the corpus() derivation)
    pairs = containment_join(docs, "doc_id", "text")
    sz = spark.createDataFrame(
        [(d, n) for d, n in sizes.items()], "doc long, n long"
    )
    j = (
        pairs.join(sz.selectExpr("doc as id1", "n as n1"), "id1")
        .join(sz.selectExpr("doc as id2", "n as n2"), "id2")
    )
    oriented = j.select(
        F.when(F.col("n1") < F.col("n2"), F.col("id1"))
        .when(F.col("n2") < F.col("n1"), F.col("id2"))
        .otherwise(F.greatest("id1", "id2")).alias("dropped"),
        F.when(F.col("n1") < F.col("n2"), F.col("id2"))
        .when(F.col("n2") < F.col("n1"), F.col("id1"))
        .otherwise(F.least("id1", "id2")).alias("keeper_cand"),
        F.when(F.col("n1") < F.col("n2"), F.col("n2"))
        .when(F.col("n2") < F.col("n1"), F.col("n1"))
        .otherwise(F.col("n1")).alias("keeper_n"),
    )
    got = {
        r.dropped: (r.keeper, r.n_containers)
        for r in oriented.groupBy("dropped")
        .agg(
            F.max_by(
                "keeper_cand",
                F.struct(F.col("keeper_n"), (-F.col("keeper_cand")).alias("g")),
            ).alias("keeper"),
            F.count("*").alias("n_containers"),
        )
        .collect()
    }
    assert got == expected


def test_lexrich_matches_python_counter(spark):
    """text-lexrich vs collections.Counter over the raw testdata."""
    from collections import Counter

    from itdb_spark.queries import load_all
    from tests.conftest import SF_DIR

    got = {
        r.doc_id: (r.n_tokens, r.n_types, r.n_hapax, r.ttr_milli, r.hapax_milli)
        for r in load_all()["text-lexrich"].spark(spark, SF_DIR).collect()
    }
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    n_checked = 0
    for doc_id, text in docs.items():
        if not text or not text.strip():
            assert doc_id not in got
            continue
        c = Counter(text.strip().lower().split())
        n_tok = sum(c.values())
        n_typ = len(c)
        n_hap = sum(1 for v in c.values() if v == 1)
        assert got[doc_id] == (
            n_tok, n_typ, n_hap, 1000 * n_typ // n_tok, 1000 * n_hap // n_tok
        ), doc_id
        n_checked += 1
    assert n_checked == len(got) > 0


def test_gini_global_matches_python_exact(spark):
    """agg-gini-global vs the direct rank-sorted Python formula —
    proving the tie-block fold IS the textbook rank sum."""
    from itdb_spark.queries import load_all
    from tests.conftest import SF_DIR

    row = load_all()["agg-gini-global"].spark(spark, SF_DIR).collect()[0]
    xs = sorted(
        r.n_chars
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    )
    n, s = len(xs), sum(xs)
    s_ranked = sum((i + 1) * x for i, x in enumerate(xs))
    assert (row.n_docs, row.sum_chars) == (n, s)
    assert row.gini_milli == 1000 * (2 * s_ranked - (n + 1) * s) // (n * s)


def test_emb_outliers_matches_numpy(spark):
    """emb-outliers vs a numpy recomputation from raw embeddings —
    same micro quantization, same exact-integer z^2 test."""
    import numpy as np

    from itdb_spark.queries import load_all
    from tests.conftest import SF_DIR

    got = {
        r.vec_id: (r.n_extreme, r.is_outlier)
        for r in load_all()["emb-outliers"].spark(spark, SF_DIR).collect()
    }
    rows = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    vecs = {
        r.vec_id: np.floor(np.array(r.embedding, dtype=np.float64) * 1e6 + 0.5)
        .astype(np.int64)
        for r in rows
        if r.embedding is not None
    }
    m = np.stack(list(vecs.values()))
    n = m.shape[0]
    s = m.sum(axis=0, dtype=object)
    ss = (m.astype(object) ** 2).sum(axis=0)
    var_num = n * ss - s * s
    checked = 0
    for vid, v in vecs.items():
        dev = n * v.astype(object) - s
        k = sum(
            1
            for j in range(64)
            if var_num[j] > 0 and dev[j] * dev[j] > 4 * var_num[j]
        )
        assert got[vid] == (k, 1 if k >= 5 else 0), vid
        checked += 1
    assert checked == len(got) > 0


def test_contain_incremental_equals_restricted_batch(spark):
    """The incremental probes must produce EXACTLY the batch join's
    result restricted to increment-touching pairs — on driver testdata
    AND on the planted skew corpus (where every planted pair straddles
    an id range, so the new/old split exercises both probes)."""
    import pyspark.sql.functions as F

    from itdb_spark.operators.dedup import (
        containment_join,
        containment_join_incremental,
    )
    from itdb_spark.queries.pipeline import corpus
    from tests.conftest import SF_DIR

    def as_set(df):
        return {tuple(r) for r in df.collect()}

    c = corpus(spark, SF_DIR).withColumn("is_new", F.col("doc_id") % 5 == 4)
    batch = containment_join(c, "doc_id", "text").where(
        (F.col("id1") % 5 == 4) | (F.col("id2") % 5 == 4)
    )
    incr = containment_join_incremental(c, "doc_id", "text", "is_new")
    assert as_set(incr) == as_set(batch)

    # planted corpus: mark the BIG docs (id >= 100000) as the increment
    # — every planted containment is an (old small, new big) pair,
    # which only probe 2 (old prefixes x new index) can generate
    rows = _planted_rows()
    docs = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "is_new", F.col("doc_id") >= 100000
    )
    incr2 = as_set(containment_join_incremental(docs, "doc_id", "text", "is_new"))
    planted = {(i, i + 100000) for i in range(N_PAIRS)}
    assert planted <= {(a, b) for a, b, *_ in incr2}
    # and nothing outside increment-touching pairs leaks in
    for a, b, *_ in incr2:
        assert b >= 100000 or a >= 100000
