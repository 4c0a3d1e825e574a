"""Round-12 additions: the persisted containment serving index
(VERDICT r11 #2) — the build-once/probe-many split for the lossless
prefix-filter containment family, mirroring what tests/test_wave11.py
pins for the MinHash band index.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_contain_persist_bit_identical_to_rebuild(spark):
    """The persisted probe must return the SAME pair set as the
    in-session rebuild at the same split. The two forms rank under
    DIFFERENT orders (rebuild: union df; persisted: the index's frozen
    df with unseen shingles at 0) — losslessness says the order changes
    only candidate pruning, never the verified output, and this gate is
    where that claim meets data."""
    from itdb_spark.operators.dedup import containment_join_incremental
    from itdb_spark.queries.pipeline import (
        _dedup_contain_incr_persist_impl,
        corpus,
    )

    c = corpus(spark, SF_DIR).withColumn("is_new", F.col("doc_id") % 5 == 4)
    rebuild = {
        tuple(r)
        for r in containment_join_incremental(
            c, "doc_id", "text", "is_new"
        ).collect()
    }
    persisted = {
        tuple(r)
        for r in _dedup_contain_incr_persist_impl(spark, SF_DIR).collect()
    }
    assert persisted == rebuild, (
        f"persisted probe diverged from rebuild "
        f"({len(persisted)} vs {len(rebuild)} rows; "
        f"only_persisted={sorted(persisted - rebuild)[:3]}, "
        f"only_rebuild={sorted(rebuild - persisted)[:3]})"
    )
    assert rebuild, "empty result proves nothing"


def test_contain_persist_triangulated_pure_python(spark, tmp_path):
    """Third-engine triangulation on a hand-built corpus that exercises
    the frozen-order edge cases: batch docs carrying shingles the index
    has NEVER seen (df=0 rank path), an exact re-crawl of an old doc
    (identical sets, containment 1000), a short doc quoted inside a
    long one across the old/new boundary (the asymmetric-containment
    case LSH misses), and an old x old near-pair that must NOT appear
    (neither side new). Expected pairs computed by brute-force Python
    set arithmetic — no Spark, no SQL."""
    from itdb_spark.operators.dedup import (
        containment_probe_persisted,
        persist_containment_index,
    )

    def sh3(text: str) -> set[str]:
        toks = text.lower().split()
        if len(toks) < 3:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    old_docs = {
        1: base,
        2: base + " lambda mu",            # near-dup of 1
        3: "alpha beta gamma delta",       # short doc contained in 1
        4: "totally unrelated words about fishing boats and rivers here",
    }
    new_docs = {
        101: base,                                        # exact re-crawl of 1
        102: "alpha beta gamma delta",                    # re-crawl of 3
        103: "quux corge grault garply waldo fred plugh", # all-new vocab
        104: base + " nu xi omicron pi rho sigma tau upsilon phi chi",
        # 104: long doc QUOTING old doc 1 wholesale (containment via 1's
        # full set; also quotes 2 partially)
    }
    t_num, t_den = 8, 10

    def brute(docs_a: dict, docs_b: dict, touch: set[int]) -> set[tuple]:
        out = set()
        union = {**docs_a, **docs_b}
        ids = sorted(union)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                if a not in touch and b not in touch:
                    continue
                sa, sb = sh3(union[a]), sh3(union[b])
                inter, small = len(sa & sb), min(len(sa), len(sb))
                if t_den * inter >= t_num * small:
                    out.add((a, b, inter, small, 1000 * inter // small))
        return out

    expected = brute(old_docs, new_docs, set(new_docs))
    assert any(i1 in (3, 102) or i2 in (3, 102) for i1, i2, *_ in expected), (
        "fixture lost its asymmetric-containment case"
    )
    assert (1, 101) in {(a, b) for a, b, *_ in expected}, (
        "fixture lost its exact re-crawl case"
    )
    assert not any(
        i1 not in new_docs and i2 not in new_docs for i1, i2, *_ in expected
    )

    old_df = spark.createDataFrame(
        [(k, v) for k, v in old_docs.items()], "doc_id long, text string"
    )
    new_df = spark.createDataFrame(
        [(k, v) for k, v in new_docs.items()], "doc_id long, text string"
    )
    root = str(tmp_path / "cidx")
    persist_containment_index(old_df, "doc_id", "text", root)
    got = {
        tuple(r)
        for r in containment_probe_persisted(
            spark, root, new_df, "doc_id", "text"
        ).collect()
    }
    assert got == expected, (
        f"only_spark={sorted(got - expected)}, "
        f"only_python={sorted(expected - got)}"
    )


def test_persist_containment_index_layout_and_refresh(spark, tmp_path):
    """Index invariants the probe's losslessness rides on: the table is
    CANONICALIZED (postings per distinct shingle set, members mapping
    every doc to its set — duplicate-content docs share one sid = the
    min member); rn is a 1..nt permutation per sid under (df, w); pfx
    marks exactly the first nt - ceil(t*nt) + 1 ranks; and a refresh
    publishes a NEW version behind the atomic manifest while a pinned
    reader keeps its old version."""
    from itdb_spark.operators.dedup import persist_containment_index
    from itdb_spark.sinks.versioned import current_version, read_current

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g h i j"),
            (3, "x y z w v u t s"),
            (7, "a b c d e f g h"),  # exact duplicate of 1
        ],
        "doc_id long, text string",
    )
    root = str(tmp_path / "cidx")
    v1 = persist_containment_index(docs, "doc_id", "text", root)
    assert v1 == "v1" and current_version(root) == "v1"
    table = read_current(spark, root)
    assert set(table.columns) == {
        "kind", "sid", "w", "df", "nt", "rn", "pfx", "doc", "ts", "kh",
    }
    members = {
        (r.sid, r.doc) for r in table.where("kind = 'member'").collect()
    }
    assert members == {(1, 1), (1, 7), (2, 2), (3, 3)}  # 1 and 7 share a set
    # the auxiliary partitions agree with the postings
    vocab = {(r.w, r.df) for r in table.where("kind = 'vocab'").collect()}
    post_wdf = {
        (r.w, r.df) for r in table.where("kind = 'post'").collect()
    }
    assert vocab == post_wdf and len(vocab) == len({w for w, _ in vocab})
    sets_ts = {
        r.sid: tuple(r.ts) for r in table.where("kind = 'set'").collect()
    }
    assert set(sets_ts) == {1, 2, 3}
    for sid, ts in sets_ts.items():
        assert list(ts) == sorted(ts) and len(set(ts)) == len(ts)
    post = table.where("kind = 'post'").collect()
    by_sid: dict[int, list] = {}
    for r in post:
        by_sid.setdefault(r.sid, []).append(r)
    assert set(by_sid) == {1, 2, 3}  # postings once per DISTINCT set
    for sid, rs in by_sid.items():
        nt = rs[0].nt
        assert len(rs) == nt == len({r.w for r in rs})
        ranked = sorted(rs, key=lambda r: (r.df, r.w))
        assert [r.rn for r in ranked] == list(range(1, nt + 1))
        want_pfx = nt - ((8 * nt + 9) // 10) + 1
        assert sum(r.pfx for r in rs) == want_pfx
        assert all(r.pfx == (r.rn <= want_pfx) for r in rs)
    pinned = read_current(spark, root)
    n_before = pinned.count()
    more = spark.createDataFrame(
        [(4, "p q r s t u v w x")], "doc_id long, text string"
    )
    v2 = persist_containment_index(docs.unionByName(more), "doc_id", "text", root)
    assert v2 == "v2" and current_version(root) == "v2"
    assert pinned.count() == n_before  # snapshot isolation
    assert read_current(spark, root).count() > n_before


def test_mm_ahash_triangulated_pure_python(spark):
    """Third engine for mm-ahash: re-derive every doc's average-hash in
    plain Python from the pixel-synthesis arithmetic (no Spark, no SQL,
    no codec — the codec path is what the Spark side adds, so agreement
    here means encode→decode→sample round-trips bit-exactly), group,
    and compare. Also pins the query's reason to exist: most pixel
    groups must MERGE all five byte-different noise variants (n_variants
    = 5), which exact and content dedup cannot do."""
    import collections

    from itdb_spark.queries.pipeline import mm_ahash
    from tests.conftest import SF_DIR

    def byte(g, i, v):
        return (g * 31 + i * 7 + (v if i % 29 == 0 else 0)) % 251

    def ahash(doc):
        g = doc % 50
        w = 1 + g % 13
        h = 1 + (g * 3) % 11
        v = (doc // 50) % 5
        lum = []
        for k in range(64):
            r, c = k // 8, k % 8
            b0 = 3 * (((r * h) // 8) * w + ((c * w) // 8))
            lum.append(
                (byte(g, b0, v) + byte(g, b0 + 1, v) + byte(g, b0 + 2, v))
                // 3
            )
        mean = sum(lum) // 64
        return "".join("1" if x > mean else "0" for x in lum), w, h

    docs = [
        r.doc_id
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    groups = collections.defaultdict(list)
    for d in docs:
        groups[ahash(d)].append(d)
    want = {
        (min(v), len(v), len({(d // 50) % 5 for d in v}), w, h, bits)
        for (bits, w, h), v in groups.items()
    }
    got = {tuple(r) for r in mm_ahash(spark, SF_DIR).collect()}
    assert got == want
    merged = [r for r in want if r[2] == 5]
    assert len(merged) >= 40, (
        f"only {len(merged)} groups merged all 5 noise variants — the "
        "perceptual-dedup fixture lost its point"
    )


def test_stream_contain_live_equals_one_shot_incremental(spark):
    """The streamed probe-then-refresh loop's emission union must equal
    the one-shot incremental containment result — the order-invariance
    argument (every pair lands exactly once, at the micro-batch where
    its later side arrives) meeting data. Exercises three real
    foreachBatch probes and three atomic index refreshes."""
    from pyspark.sql import functions as F

    from itdb_spark.operators.dedup import containment_join_incremental
    from itdb_spark.queries.pipeline import corpus
    from itdb_spark.queries.streamingq import stream_contain_live
    from tests.conftest import SF_DIR

    one_shot = {
        tuple(r)
        for r in containment_join_incremental(
            corpus(spark, SF_DIR).withColumn(
                "is_new", F.col("doc_id") % 5 == 4
            ),
            "doc_id",
            "text",
            "is_new",
        ).collect()
    }
    streamed_rows = [tuple(r) for r in stream_contain_live(spark, SF_DIR).collect()]
    streamed = set(streamed_rows)
    assert len(streamed_rows) == len(streamed), "a pair emitted twice"
    assert streamed == one_shot
    assert streamed, "empty result proves nothing"


def test_range_search_missband_and_recall(spark):
    """The two guarantees the range-search pair's docstrings promise:
    (1) the 0.25 threshold is decided far above float summation-order
    noise — no organic cosine sits within 1e-9 of it (the
    dedup-embedding miss-band discipline); (2) IVF range recall vs the
    brute baseline is MEASURED: every IVF hit is a brute hit with the
    identical rounded cosine (probing only prunes, never invents), and
    recall at n_probe=3 of 8 cells stays above the floor that makes
    the pruned form useful."""
    from itdb_spark.queries.pipeline import sim_range_brute, sim_range_ivf
    from tests.conftest import SF_DIR

    brute = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in sim_range_brute(spark, SF_DIR).collect()
    }
    assert brute, "empty range proves nothing"
    # miss-band: recompute unrounded cosines near the threshold
    from itdb_spark.operators.similarity import cosine_pandas
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qvec")
    )
    gap = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            F.abs(
                cosine_pandas(F.col("qvec"), F.col("vec")) - F.lit(0.25)
            ).alias("g")
        )
        .agg(F.min("g"))
        .collect()[0][0]
    )
    assert gap > 1e-9, f"a cosine sits {gap} from the threshold"

    ivf = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in sim_range_ivf(spark, SF_DIR).collect()
    }
    assert set(ivf) <= set(brute), "IVF invented a hit brute lacks"
    for pair, c in ivf.items():
        assert brute[pair] == c, f"cosine drift on {pair}"
    recall = len(ivf) / len(brute)
    assert recall >= 0.6, f"range recall {recall:.2f} at n_probe=3"


def test_stream_knn_live_equals_one_shot_search(spark):
    """The streamed ANN server's emission union must equal the one-shot
    persisted-index search over the same 15 queries — searches are
    independent per query, so micro-batching must change nothing; also
    pins one result row per (query, rank) with no duplicates across
    micro-batches."""
    from pyspark.sql import functions as F

    from itdb_spark.operators.ivf import ivf_search_persisted
    from itdb_spark.queries.pipeline import _ivf_persist_root
    from itdb_spark.queries.streamingq import stream_knn_live
    from tests.conftest import SF_DIR

    root = _ivf_persist_root(spark, SF_DIR)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    one_shot = {
        tuple(r)
        for r in ivf_search_persisted(
            spark, root, emb.where(F.col("vec_id") < 15), k=5, n_probe=3
        ).collect()
    }
    rows = [tuple(r) for r in stream_knn_live(spark, SF_DIR).collect()]
    assert len(rows) == len(set(rows)), "duplicate emission across batches"
    assert set(rows) == one_shot
    assert {q for q, *_ in rows} == set(range(15))


def test_append_version_chain_and_vacuum_safety(spark, tmp_path):
    """The table-format kernel's append half: a delta version holds only
    its own rows plus the _PARENT marker; read_current_chain unions the
    ancestry; a pinned chain reader survives a later append (snapshot
    isolation); vacuum never deletes a published ancestor (the chain is
    load-bearing data) but still sweeps replaced non-ancestors; and the
    schema gate refuses drops/retypes on append."""
    import os

    import pytest
    from itdb_spark.sinks import versioned as V

    root = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    assert V.write_version(base, root) == "v1"
    d1 = spark.createDataFrame([(3, "c")], "k long, v string")
    assert V.append_version(d1, root) == "v2"
    pinned = V.read_current_chain(spark, root)
    assert pinned.count() == 3
    d2 = spark.createDataFrame([(4, "d")], "k long, v string")
    assert V.append_version(d2, root) == "v3"
    assert pinned.count() == 3  # snapshot isolation across an append
    assert V.chain_versions(root) == ["v3", "v2", "v1"]
    got = {tuple(r) for r in V.read_current_chain(spark, root).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c"), (4, "d")}
    # delta dirs hold ONLY their delta
    assert spark.read.parquet(os.path.join(root, "v3")).count() == 1
    # vacuum keeps the whole published ancestry even with keep=1
    assert V.vacuum(root, keep=1, min_age_s=0) == []
    assert got == {tuple(r) for r in V.read_current_chain(spark, root).collect()}
    # a REPLACE on top of the chain makes the ancestry unreachable —
    # then (and only then) vacuum may sweep it
    V.write_version(V.read_current_chain(spark, root), root)
    swept = V.vacuum(root, keep=1, min_age_s=0)
    assert set(swept) == {"v1", "v2", "v3"}
    assert {
        tuple(r) for r in V.read_current_chain(spark, root).collect()
    } == got
    with pytest.raises(ValueError, match="retyped"):
        V.append_version(
            spark.createDataFrame([(5, 6)], "k long, v long"), root
        )


def test_append_containment_index_batch_bounded_and_equivalent(spark, tmp_path):
    """The refresh-amortization gate: after appending batch1 as a delta,
    probing batch2 against the CHAIN must return exactly what probing
    batch2 against a FULL REBUILD over (old ∪ batch1) returns —
    losslessness under the permanently frozen v1 order, across a real
    refresh. Each delta version materializes only batch-scale rows, and
    duplicate-content batch docs join their EXISTING set (member-only
    delta, no re-ranked postings)."""
    import os

    from pyspark.sql import functions as F

    from itdb_spark.operators.dedup import (
        append_containment_index,
        containment_probe_persisted,
        persist_containment_index,
    )
    from itdb_spark.queries.pipeline import corpus
    from itdb_spark.sinks import versioned as V

    docs = corpus(spark, SF_DIR).select("doc_id", "source", "text")
    old = docs.where(F.col("doc_id") % 5 < 3)
    batch1 = docs.where(F.col("doc_id") % 5 == 3)
    batch2 = docs.where(F.col("doc_id") % 5 == 4)

    chain_root = str(tmp_path / "chain")
    persist_containment_index(old, "doc_id", "text", chain_root)
    v1_rows = spark.read.parquet(os.path.join(chain_root, "v1")).count()
    append_containment_index(spark, chain_root, batch1, "doc_id", "text")
    assert V.chain_versions(chain_root) == ["v2", "v1"]
    delta = spark.read.parquet(os.path.join(chain_root, "v2"))
    assert 0 < delta.count() < v1_rows  # batch-scale, not corpus-scale
    # exact-duplicate batch docs (the +200000 copies of old-slice docs
    # share content only with same-residue docs — so check via sets):
    # every batch1 doc must appear in the chain's member partition
    members = {
        r.doc
        for r in V.read_current_chain(spark, chain_root)
        .where("kind = 'member'")
        .select("doc")
        .collect()
    }
    b1 = {r.doc_id for r in batch1.select("doc_id").collect()}
    assert b1 <= members

    rebuild_root = str(tmp_path / "rebuild")
    persist_containment_index(
        old.unionByName(batch1), "doc_id", "text", rebuild_root
    )
    via_chain = {
        tuple(r)
        for r in containment_probe_persisted(
            spark, chain_root, batch2, "doc_id", "text"
        ).collect()
    }
    via_rebuild = {
        tuple(r)
        for r in containment_probe_persisted(
            spark, rebuild_root, batch2, "doc_id", "text"
        ).collect()
    }
    assert via_chain == via_rebuild and via_chain, (
        f"chain={len(via_chain)} rebuild={len(via_rebuild)}"
    )


def test_exact_int_gemm_property():
    """Property gate for the split-GEMM exactness proof: against
    arbitrary int64 matrices within the guarded magnitude bound, both
    kernels must equal the arbitrary-precision integer product (numpy
    object dtype = Python bigints — a third engine with no float
    anywhere). Adversarial corners included deliberately: max-magnitude
    values, negatives (the arithmetic-shift floor split), and the
    guard's rejection just past the bound."""
    import numpy as np
    import pytest
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    from itdb_spark.operators.moments import (
        _MAX_MICRO_ABS,
        _exact_int_matmul,
        exact_int_gemm,
    )

    bound = _MAX_MICRO_ABS - 1
    mat = lambda n, m: arrays(  # noqa: E731
        np.int64, (n, m),
        elements=st.integers(min_value=-bound, max_value=bound),
    )

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(1, 7).flatmap(
            lambda n: st.tuples(
                st.integers(1, 5), st.integers(1, 4), st.just(n)
            ).flatmap(
                lambda t: st.tuples(mat(t[2], t[0]), mat(t[0], t[1]))
            )
        )
    )
    def check(ab):
        a, b = ab
        want = a.astype(object) @ b.astype(object)
        got = exact_int_gemm(a, b)
        assert (got.astype(object) == want).all()
        sym = _exact_int_matmul(a)
        want_sym = a.astype(object).T @ a.astype(object)
        assert (sym.astype(object) == want_sym).all()

    check()

    # the extremes exactly at the bound, dense
    a = np.full((3, 4), bound, dtype=np.int64)
    a[0, 0] = -bound
    b = np.full((4, 2), -bound, dtype=np.int64)
    assert (
        exact_int_gemm(a, b).astype(object)
        == a.astype(object) @ b.astype(object)
    ).all()
    with pytest.raises(ValueError, match="split-gemm bound"):
        exact_int_gemm(
            np.array([[_MAX_MICRO_ABS]], dtype=np.int64),
            np.array([[1]], dtype=np.int64),
        )


def test_append_band_index_probe_equivalence(spark, tmp_path):
    """Two-step ingest against an append-maintained band index must
    answer collision probes exactly like a rebuilt index over the same
    corpus, and the keys sibling must stay a SET (an append adds only
    genuinely novel bucket keys — re-crawled content contributes zero
    delta key rows)."""
    from pyspark.sql import functions as F

    from itdb_spark.operators.dedup import (
        append_band_index,
        band_collision_counts,
        band_collision_counts_persisted,
        minhash_bands,
        minhash_signatures,
        persist_band_index,
    )
    from itdb_spark.queries.pipeline import corpus
    from itdb_spark.sinks import versioned as V

    bands = minhash_bands(
        minhash_signatures(corpus(spark, SF_DIR), "doc_id", "text")
    ).cache()
    base = bands.where(F.col("doc") % 5 < 3)
    b1 = bands.where(F.col("doc") % 5 == 3)
    b2 = bands.where(F.col("doc") % 5 == 4)
    root = str(tmp_path / "bidx")
    persist_band_index(base, root)
    append_band_index(spark, root, b1)
    assert V.chain_versions(root) == ["v2", "v1"]
    got = {
        tuple(r)
        for r in band_collision_counts_persisted(spark, root, b2).collect()
    }
    want = {
        tuple(r)
        for r in band_collision_counts(b2, base.unionByName(b1)).collect()
    }
    assert got == want and got
    keys = V.read_current_chain(spark, root + "_keys").select(
        "band", "band_hash"
    )
    assert keys.count() == keys.distinct().count()
    # exact re-crawl: appending b1 AGAIN (same content, same keys) adds
    # zero key rows — the delta carries only novel buckets
    n_keys = keys.count()
    append_band_index(
        spark, root, b1.select(
            (F.col("doc") + 10_000_000).alias("doc"), "band", "band_hash"
        )
    )
    assert (
        V.read_current_chain(spark, root + "_keys").count() == n_keys
    )
    bands.unpersist()


def test_compact_chain_folds_and_gates(spark, tmp_path):
    """Chain compaction: fold a 3-link chain into one replace version
    behind the additive (rows, checksum) parity gate, after which the
    old links are vacuum-eligible and the data is byte-equal."""
    from itdb_spark.sinks import versioned as V

    root = str(tmp_path / "t")
    V.write_version(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), root
    )
    V.append_version(spark.createDataFrame([(3, "c")], "k long, v string"), root)
    V.append_version(spark.createDataFrame([(4, "d")], "k long, v string"), root)
    before = {tuple(r) for r in V.read_current_chain(spark, root).collect()}
    stats = V.compact_chain(spark, root)
    assert stats["rows"] == 4 and stats["folded_chain"] == ["v3", "v2", "v1"]
    assert V.chain_versions(root) == ["v4"]  # replace version: no parent
    assert {tuple(r) for r in V.read_current_chain(spark, root).collect()} == before
    assert set(V.vacuum(root, keep=1, min_age_s=0)) == {"v1", "v2", "v3"}
    assert {tuple(r) for r in V.read_current_chain(spark, root).collect()} == before
