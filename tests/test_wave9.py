"""Round-9 wave invariants: eval-editdist / pipe-datacard /
text-readability / dedup-contain / emb-dimstats / src-parquet-meta.

The driver-gate differential (Spark vs DuckDB) is the primary
correctness signal for every one of these; the tests here add THIRD
implementations (pure Python / numpy) and cross-query consistency, the
triangulation discipline the earlier waves use (two engines can share a
misreading of a spec; an independent reimplementation rarely shares it
with both).
"""

from __future__ import annotations

from tests.conftest import SF_DIR


def _py_levenshtein(a: bytes, b: bytes) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


def test_eval_editdist_matches_python_byte_levenshtein(spark):
    """Third-engine differential: every graded pair's distance must equal
    a pure-Python Levenshtein over the UTF-8 BYTES (the documented
    semantics both engines implement — DuckDB natively, Spark via the
    ISO-8859-1 decode of the UTF-8 encoding). Runs on the edge corpus
    so the planted CJK / NFC-vs-NFD / whitespace-only pairs exercise
    the multi-byte paths."""
    from itdb_spark.queries import load_all
    from tools.edge_corpus import build_edge_dir

    dst = build_edge_dir(SF_DIR, "/tmp/itdb_spark_edge_test")
    got = {
        r.pair_id: (r.dist, r.maxlen, r.sim_milli)
        for r in load_all()["eval-editdist"].spark(spark, dst).collect()
    }
    docs = {
        r.doc_id: (r.text or "")
        for r in spark.read.parquet(f"{dst}/documents.parquet").collect()
    }
    assert len(got) >= 30
    for pair_id, (dist, maxlen, sim) in got.items():
        ct = docs[pair_id].encode("utf-8")
        rt = docs[pair_id + 1].encode("utf-8")
        want = _py_levenshtein(ct, rt)
        assert dist == want, (pair_id, dist, want)
        assert maxlen == max(len(ct), len(rt))
        assert sim == (
            1000 if maxlen == 0 else (1000 * (maxlen - dist)) // maxlen
        )


def test_text_readability_matches_python_formula(spark):
    """Third-engine differential: recompute the fixed-point Flesch
    variant (206835 - (1015*W) DIV max(1,S) - (84600*Syl) DIV W, vowel-
    group syllables, [.!?]+ sentences, whitespace words) in pure Python
    for every doc and compare exactly."""
    import re

    from itdb_spark.queries import load_all

    got = {
        r.doc_id: (r.n_words, r.n_sent, r.n_syll, r.flesch_milli)
        for r in load_all()["text-readability"].spark(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    checked = 0
    for d in docs:
        if d.text is None:
            assert d.doc_id not in got
            continue
        w = 0 if not d.text.strip() else len(re.split(r"\s+", d.text.strip()))
        s = len(re.findall(r"[.!?]+", d.text))
        syl = len(re.findall(r"[aeiou]+", d.text.lower()))
        flesch = (
            None
            if w == 0
            else 206835 - (1015 * w) // max(1, s) - (84600 * syl) // w
        )
        assert got[d.doc_id] == (w, s, syl, flesch), (d.doc_id, got[d.doc_id])
        checked += 1
    assert checked == len(got) >= 400


def test_pipe_datacard_cross_query_consistency(spark):
    """The card's totals must reconcile with the raw table: per-source
    doc counts sum to the table count, dup_docs equals docs minus
    distinct texts (NULL normalized to ''), token totals match the
    repo tokenizer, and mean_tokens_milli is the integer identity."""
    from itdb_spark.queries import load_all

    rows = load_all()["pipe-datacard"].spark(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    assert sum(r.n_docs for r in rows) == len(docs)
    by_src: dict[str, list] = {}
    for d in docs:
        by_src.setdefault(d.source, []).append(d)
    assert {r.source for r in rows} == set(by_src)
    for r in rows:
        ds = by_src[r.source]
        texts = [(d.text or "") for d in ds]
        toks = [0 if not t.strip() else len(t.strip().split()) for t in texts]
        assert r.n_docs == len(ds)
        assert r.total_tokens == sum(toks)
        assert r.total_chars == sum(len(t) for t in texts)
        assert r.n_langs == len({d.lang for d in ds if d.lang is not None})
        assert r.dup_docs == len(ds) - len(set(texts))
        assert r.mean_tokens_milli == (1000 * sum(toks)) // len(ds)


def test_dedup_contain_exact_copies_full_containment(spark):
    """The corpus() derivation plants an exact copy of every doc at
    +200000; exact copies collide in EVERY LSH band, so each pair is a
    guaranteed candidate and must surface with contain_milli == 1000
    (identical token sets). Also: containment >= Jaccard on every
    emitted pair (C uses min, J uses union — the reason the operator
    exists), with the threshold honored."""
    from itdb_spark.queries import load_all

    rows = load_all()["dedup-contain"].spark(spark, SF_DIR).collect()
    got = {(r.id1, r.id2): r for r in rows}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    planted = 0
    for d in docs:
        if d.text and d.text.strip():
            pair = (d.doc_id, d.doc_id + 200000)
            assert pair in got, pair
            assert got[pair].contain_milli == 1000, got[pair]
            planted += 1
    assert planted >= 400
    for r in rows:
        assert 10 * r.inter >= 8 * r.small
        assert r.contain_milli == 1000 * r.inter // r.small


def test_emb_dimstats_matches_numpy_moments(spark):
    """Third-engine differential: n / sum / sum-of-squares per dimension
    must equal numpy over the same half-up micro quantization, and the
    variance derived from the exact moments must match numpy's within
    quantization error."""
    import math

    import numpy as np

    from itdb_spark.queries import load_all

    rows = load_all()["emb-dimstats"].spark(spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    X = np.asarray([r.embedding for r in emb if r.embedding is not None],
                   dtype=np.float64)
    M = np.floor(X * 1_000_000 + 0.5).astype(np.int64)
    assert len(rows) == X.shape[1] == 64
    for r in rows:
        col = M[:, r.pos]
        assert r.n == len(col)
        assert r.sum_micro == int(col.sum())
        assert int(r.sumsq_micro2) == int((col.astype(object) ** 2).sum())
        assert r.mean_micro == int(
            math.trunc(col.sum() / len(col))
            if col.sum() < 0
            else col.sum() // len(col)
        )
        # moment-derived variance vs numpy (micro^2 units)
        n, s, ss = r.n, r.sum_micro, int(r.sumsq_micro2)
        var_moments = (n * ss - s * s) / (n * n)
        ref = float(col.var())
        assert abs(var_moments - ref) <= 1e-9 * max(1.0, abs(ref))


def test_src_parquet_meta_fixture_arithmetic(spark):
    """The footer source must report exactly the fixture's formula:
    3 files, (200 rows, 2 groups), (50, 1), (120, 3) — a data-page
    read or footer misparse cannot produce these numbers by accident."""
    from itdb_spark.queries import load_all

    rows = sorted(
        (r.file_name, r.num_rows, r.num_row_groups)
        for r in load_all()["src-parquet-meta"].spark(spark, SF_DIR).collect()
    )
    assert rows == [
        ("a.parquet", 200, 2),
        ("b.parquet", 50, 1),
        ("c.parquet", 120, 3),
    ]


def test_wave9_plans_hold_scale_properties(spark):
    """The round-9 wave carries the repo-wide physical-plan contract:
    zero single-partition exchanges, zero nested-loop joins, pushdown
    on every parquet scan — plus per-query exchange ceilings pinned at
    today's plan (text-readability is genuinely scan-only; emb-dimstats
    is one map-side-combined aggregation; pipe-datacard's two-phase
    count-distinct expands to two)."""
    from itdb_spark.queries import load_all
    from tools.audit_plans import audit

    ceilings = {
        "eval-editdist": 2,
        "pipe-datacard": 2,
        "text-readability": 0,
        "dedup-contain": 9,   # the shared minhash candidate machinery
        "emb-dimstats": 1,
        "src-parquet-meta": 1,  # the round-robin over the path list
        # wave 2: hamming's 1 BNLJ is the declared 5-row query-
        # fingerprint broadcast (checked separately below); streak is
        # two keyed shuffles (distinct + per-user window); WAU is the
        # pre-aggregate + coverage-distinct + final count chain
        "sim-knn-hamming": 4,
        "agg-streak": 2,
        "win-active-users": 5,
        # wave 3 (revised round 10): novelty is distinct-gram explode +
        # (count, min(doc)) gram groupBy + TWO doc-keyed aggregations +
        # one doc-keyed join — one exchange MORE than the first cut's
        # gram-keyed join form, which Catalyst could turn into a
        # multi-GB broadcast at the 100x point and OOM (SCALE.md
        # §"The 100x point"); the extra doc-keyed exchange is the
        # price of removing that plan class. ohlc is ONE map-side-
        # combined hour groupBy; the timeseries densify pays the
        # declared O(1)-row global bounds aggregate (its single-
        # partition exchange, allowed below)
        "text-novelty": 6,
        "agg-ohlc": 1,
        "agg-timeseries": 3,
        # wave 5: skyline's single-partition exchange is the declared
        # dimension-frame running max (|distinct lengths| rows);
        # attribution is the one-exchange union-tag asof plan + the
        # view pre-collapse groupBy
        "agg-skyline": 3,
        "agg-attribution": 2,
    }
    registry = load_all()
    failures = []
    for qid, ceiling in ceilings.items():
        df = registry[qid].spark(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        a = audit(plan)
        allowed_sp = (  # declared O(1)/dimension-frame globals
            1 if qid in ("agg-timeseries", "agg-skyline") else 0
        )
        if a["single_partition_exchanges"] != allowed_sp:
            failures.append(f"{qid}: single-partition exchange count")
        if a["nested_loop_joins"] != (1 if qid == "sim-knn-hamming" else 0):
            failures.append(f"{qid}: unexpected nested-loop join count")
        if a["pushed_filters"] != a["scans"]:
            failures.append(
                f"{qid}: {a['scans']} scans, {a['pushed_filters']} pushed"
            )
        n_ex = plan.count("Exchange")
        if n_ex > ceiling:
            failures.append(f"{qid}: {n_ex} exchanges > ceiling {ceiling}")
    assert not failures, "\n".join(failures)


def test_sim_knn_hamming_matches_python(spark):
    """Third-engine differential: recompute the top-10-by-Hamming
    neighbor lists in pure Python from the (already oracle-verified)
    dedup-simhash fingerprints and compare exactly, tie-breaks
    included — at 16 bits ties are the norm, so this is really a test
    of the deterministic ordering."""
    from itdb_spark.queries import load_all

    reg = load_all()
    fp = {
        r.doc: r.simhash
        for r in reg["dedup-simhash"].spark(spark, SF_DIR).collect()
    }
    got: dict[int, list] = {}
    for r in reg["sim-knn-hamming"].spark(spark, SF_DIR).collect():
        got.setdefault(r.query_id, []).append((r.hamming, r.neighbor_id))
    assert set(got) == {0, 1, 2, 3, 4}
    for q, rows in got.items():
        want = sorted(
            (bin(fp[q] ^ v).count("1"), d) for d, v in fp.items() if d != q
        )[:10]
        assert sorted(rows) == want, (q, sorted(rows)[:3], want[:3])


def test_agg_streak_matches_python(spark):
    """Third-engine differential: per-user longest consecutive-epoch-day
    run recomputed in pure Python (longest length, earliest start on
    ties) over the raw events."""
    from itdb_spark.queries import load_all

    got = {
        r.user_id: (r.streak_days, r.start_day)
        for r in load_all()["agg-streak"].spark(spark, SF_DIR).collect()
    }
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_user: dict = {}
    for e in events:
        if e.ts is None:
            continue
        day = int(e.ts.timestamp()) // 86400
        by_user.setdefault(e.user_id, set()).add(day)
    assert set(got) == set(by_user)
    for u, days in by_user.items():
        best = None  # (len, -start) maximized
        ds = sorted(days)
        i = 0
        while i < len(ds):
            j = i
            while j + 1 < len(ds) and ds[j + 1] == ds[j] + 1:
                j += 1
            cand = (j - i + 1, -ds[i])
            if best is None or cand > best:
                best = cand
            i = j + 1
        assert got[u] == (best[0], -best[1]), (u, got[u], best)


def test_win_active_users_matches_python(spark):
    """Third-engine differential: trailing-7-day distinct users per
    observed day recomputed in pure Python."""
    from itdb_spark.queries import load_all

    got = {
        r.day: r.wau
        for r in load_all()["win-active-users"].spark(spark, SF_DIR).collect()
    }
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    acts = {
        (e.user_id, int(e.ts.timestamp()) // 86400)
        for e in events
        if e.ts is not None and e.user_id is not None
    }
    days = {d for _, d in acts}
    assert set(got) == days
    for d in days:
        wau = len({u for (u, ad) in acts if d - 6 <= ad <= d})
        assert got[d] == wau, (d, got[d], wau)


def test_text_novelty_matches_python(spark):
    """Third-engine differential: per-doc distinct-8-gram novelty
    recomputed in pure Python over the raw documents."""
    from itdb_spark.queries import load_all

    got = {
        r.doc: (r.total_grams, r.novel_grams, r.novelty_milli)
        for r in load_all()["text-novelty"].spark(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    gram_sets = {}
    for d in docs:
        if d.text is None or not d.text.strip():
            continue
        t = d.text.strip().lower().split()
        gram_sets[d.doc_id] = {
            " ".join(t[i : i + 8]) for i in range(len(t) - 7)
        }
    df: dict[str, int] = {}
    for gs in gram_sets.values():
        for g in gs:
            df[g] = df.get(g, 0) + 1
    expect = {
        doc: (len(gs), sum(1 for g in gs if df[g] == 1))
        for doc, gs in gram_sets.items()
        if gs
    }
    assert set(got) == set(expect)
    for doc, (total, novel) in expect.items():
        assert got[doc] == (total, novel, 1000 * novel // total), doc


def test_agg_ohlc_matches_python(spark):
    """Third-engine differential: open/high/low/close per epoch-hour
    recomputed in pure Python with the (ts-micros, event_id) unique
    ordering."""
    from itdb_spark.queries import load_all

    got = {
        r.hour: (r.open_c, r.high_c, r.low_c, r.close_c, r.n_events)
        for r in load_all()["agg-ohlc"].spark(spark, SF_DIR).collect()
    }
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    buckets: dict[int, list] = {}
    for e in events:
        if e.ts is None or e.value is None:
            continue
        tsu = int(e.ts.timestamp() * 1_000_000)
        c = int(round(e.value * 100))
        buckets.setdefault(tsu // 3_600_000_000, []).append(
            (tsu, e.event_id, c)
        )
    assert set(got) == set(buckets)
    for h, rows in buckets.items():
        rows.sort()
        cs = [c for _, _, c in rows]
        assert got[h] == (rows[0][2], max(cs), min(cs), rows[-1][2],
                          len(rows)), h


def test_agg_timeseries_gap_filling(spark):
    """The densify contract: one row per hour in [min, max] with no
    holes, zero_filled exactly on hours absent from the raw counts,
    and the non-zero rows exactly the raw per-hour counts."""
    from itdb_spark.queries import load_all

    rows = sorted(
        (r.hour, r.n_events, r.zero_filled)
        for r in load_all()["agg-timeseries"].spark(spark, SF_DIR).collect()
    )
    hours = [h for h, _, _ in rows]
    assert hours == list(range(hours[0], hours[-1] + 1)), "holes in frame"
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    counts: dict[int, int] = {}
    for e in events:
        if e.ts is not None:
            h = int(e.ts.timestamp()) // 3600
            counts[h] = counts.get(h, 0) + 1
    for h, n, zf in rows:
        assert n == counts.get(h, 0), h
        assert zf == (0 if h in counts else 1), h
    assert min(counts) == hours[0] and max(counts) == hours[-1]


def test_src_hive_partition_prunes(spark):
    """The lang predicate must resolve into PartitionFilters on the
    partitioned scan and only the en/ directory's files may be read —
    plus NULL-lang rows (planted by the edge corpus) land in the
    default partition and never leak into 'en'."""
    import re as _re

    from pyspark.sql import functions as F

    from itdb_spark.queries import load_all

    df = load_all()["src-hive-partition"].spark(spark, SF_DIR)
    rows = df.collect()
    assert rows and all(r.lang == "en" for r in rows)
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    pfs = _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("lang" in pf for pf in pfs), plan
    files = {
        r.f
        for r in df.select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert files and all("/lang=en/" in f for f in files), files


def test_agg_skyline_matches_python_dominance(spark):
    """Third-engine differential: the scale-safe sweep must equal the
    naive O(n^2) dominance definition computed in pure Python — and
    every non-skyline doc must be witnessed dominated."""
    from itdb_spark.queries import load_all

    reg = load_all()
    got = {
        r.doc_id: (r.n_tok, r.q_micro)
        for r in reg["agg-skyline"].spark(spark, SF_DIR).collect()
    }
    # rebuild the dims from the same graded helpers
    from pyspark.sql import functions as F

    from itdb_spark.functions.text import quality_score, tokens

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .where(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.size(tokens(F.col("text"))).cast("long").alias("t"),
            F.round(quality_score(F.col("text")) * 1000000)
            .cast("long")
            .alias("q"),
        )
        .collect()
    )
    dims = [(d.doc_id, d.t, d.q) for d in docs]
    sky = set()
    for i, ti, qi in dims:
        dominated = any(
            tj >= ti and qj >= qi and (tj > ti or qj > qi)
            for j, tj, qj in dims
            if j != i
        )
        if not dominated:
            sky.add(i)
    assert set(got) == sky
    for doc_id, (t, q) in got.items():
        assert (doc_id, t, q) in {(i, ti, qi) for i, ti, qi in dims}


def test_agg_attribution_matches_python(spark):
    """Third-engine differential: last-touch-within-7-days recomputed in
    pure Python (latest view at vts <= purchase ts, same-instant view
    ties to min event_id, gap capped at the tolerance)."""
    from itdb_spark.queries import load_all

    got = {
        r.purchase_id: (r.view_id, r.gap_us)
        for r in load_all()["agg-attribution"].spark(spark, SF_DIR).collect()
    }
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    TOL = 7 * 86400 * 1_000_000
    views: dict = {}
    purchases = []
    for e in events:
        if e.ts is None or e.user_id is None:
            continue
        tsu = int(e.ts.timestamp() * 1_000_000)
        if e.event_type == "view":
            key = (e.user_id, tsu)
            views[key] = min(views.get(key, e.event_id), e.event_id)
        elif e.event_type == "purchase":
            purchases.append((e.event_id, e.user_id, tsu))
    by_user: dict = {}
    for (u, tsu), vid in views.items():
        by_user.setdefault(u, []).append((tsu, vid))
    assert set(got) == {p for p, _, _ in purchases}
    for pid, u, tsu in purchases:
        cands = [
            (vtsu, vid)
            for vtsu, vid in by_user.get(u, [])
            if vtsu <= tsu and tsu - vtsu <= TOL
        ]
        want = (
            (max(cands)[1], tsu - max(cands)[0]) if cands else (None, None)
        )
        assert got[pid] == want, (pid, got[pid], want)


def test_stream_ohlc_live_equals_batch_twin(spark):
    """The live OHLC stream must be BIT-IDENTICAL to the batch agg-ohlc:
    the min_by/max_by ordering keys survive streaming state merge, so
    micro-batch arrival order cannot perturb open/close — proven by
    equality, not just by both matching the oracle."""
    from itdb_spark.queries import load_all

    reg = load_all()
    batch = sorted(tuple(r) for r in reg["agg-ohlc"].spark(spark, SF_DIR).collect())
    live = sorted(
        tuple(r) for r in reg["stream-ohlc-live"].spark(spark, SF_DIR).collect()
    )
    assert batch and batch == live


def test_text_keyphrase_matches_python_rake(spark):
    """Third-engine differential: RAKE recomputed in pure Python —
    stopword-delimited phrase runs (<=3 words), per-doc deg/freq word
    scores in integer millis, phrase scores summed, top-3 with the
    (score desc, phrase asc) tie-break."""
    from itdb_spark.functions.text import EN_STOPWORDS
    from itdb_spark.queries import load_all

    got: dict[int, list] = {}
    for r in load_all()["text-keyphrase"].spark(spark, SF_DIR).collect():
        got.setdefault(r.doc, []).append((r.phrase, r.score_milli))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    stops = set(EN_STOPWORDS)
    checked = 0
    for d in docs:
        if d.doc_id >= 100 or d.text is None or not d.text.strip():
            continue
        toks = d.text.strip().lower().split()
        phrases, run = [], []
        for w in toks:
            if w in stops:
                if run:
                    phrases.append(run)
                run = []
            else:
                run = run + [w]
        if run:
            phrases.append(run)
        phrases = [p for p in phrases if len(p) <= 3]
        freq: dict[str, int] = {}
        deg: dict[str, int] = {}
        for p in phrases:
            for w in p:
                freq[w] = freq.get(w, 0) + 1
                deg[w] = deg.get(w, 0) + len(p)
        scored: dict[str, int] = {}
        for p in phrases:
            s = sum(1000 * deg[w] // freq[w] for w in p)
            scored[" ".join(p)] = s  # dupes share the score
        want = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        have = sorted(got.get(d.doc_id, []), key=lambda kv: (-kv[1], kv[0]))
        assert have == want, (d.doc_id, have, want)
        checked += 1
    assert checked >= 90


def test_dedup_normalized_catches_reformatted_copies(spark, tmp_path):
    """The canonicalization tier's reason to exist: copies that differ
    only by whitespace runs, case, or NFC-vs-NFD encoding must land in
    ONE fingerprint group (raw md5 — dedup-exact — sees four distinct
    texts), and genuinely different texts never merge. Proven on a
    planted micro-corpus."""
    import duckdb

    from itdb_spark.catalog import TESTDATA_TABLES
    from itdb_spark.queries import load_all
    from tools.check_oracle import check_one

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path / "norm")
    import os

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        if t == "documents":
            continue
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    # four reformatted copies of one text + one genuinely different doc
    nfd_e = "é"  # decomposed é
    rows = [
        (1, "Café data  pipeline", "en", "web"),
        (2, "café   data pipeline", "en", "web"),       # ws + case
        (3, f"caf{nfd_e} data pipeline", "en", "web"),        # NFD
        (4, "  Café data pipeline ", "en", "web"),       # padding
        (5, "something else entirely", "en", "web"),
    ]
    con.execute(
        f"""COPY (SELECT * FROM (VALUES {", ".join(
            "(%d, '%s', '%s', '%s', %d)" % (i, t.replace("'", "''"), l, s, len(t))
            for i, t, l, s in rows
        )} ) v(doc_id, text, lang, source, n_chars))
        TO '{dst}/documents.parquet' (FORMAT PARQUET)"""
    )
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{dst}/{t}.parquet')"
        )
    reg = load_all()
    q = reg["dedup-normalized"]
    got = q.spark(spark, dst).collect()
    # corpus() triples the docs (+100000 leading-word-strip, +200000
    # exact). The strip never fires on these texts (the word after the
    # leading token boundary is accented/capitalized), so the four
    # variants + their +100000 AND +200000 copies form ONE 12-member
    # canonical group; doc 5's +100000 copy IS mutated ('something '
    # stripped), leaving its base+exact 2-member group
    sizes = sorted(r.cnt for r in got)
    assert sizes == [2, 12], got
    big = max(got, key=lambda r: r.cnt)
    assert big.keep_doc == 1 and big.max_doc == 200004, got
    # and the differential holds on the planted corpus too
    status, msg = check_one("dedup-normalized", q, spark, con, dst)
    assert status == "PASS", msg


def test_fn_embed_whiten_matches_numpy(spark):
    """Third-engine differential: whitened z-scores must equal numpy's
    (x - mean)/std over the same micro quantization (population std,
    ddof=0), within round(,6) of the closed form."""
    import numpy as np

    from itdb_spark.queries import load_all

    got = {
        (r.vec_id, r.pos): r.z
        for r in load_all()["fn-embed-whiten"].spark(spark, SF_DIR).collect()
    }
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    rows = [(r.vec_id, r.embedding) for r in emb if r.embedding is not None]
    M = np.floor(
        np.asarray([v for _, v in rows], dtype=np.float64) * 1_000_000 + 0.5
    )
    mu, sd = M.mean(axis=0), M.std(axis=0)
    ids = [i for i, _ in rows]
    n_checked = 0
    for r_i, vid in enumerate(ids):
        if vid >= 10:
            continue
        for pos in range(M.shape[1]):
            want = (
                None
                if sd[pos] == 0
                else round((M[r_i, pos] - mu[pos]) / sd[pos], 6)
            )
            z = got[(vid, pos)]
            if want is None:
                assert z is None
            else:
                assert z is not None and abs(z - want) <= 1e-6, (vid, pos, z, want)
            n_checked += 1
    assert n_checked == 640


def test_pipe_dsir_matches_python(spark):
    """Third-engine differential: DSIR hashed-bigram log importance
    weights recomputed in pure Python (md5-prefix portable hash, 64
    buckets, add-one smoothing, bucket-sorted fold)."""
    import hashlib
    import math

    from itdb_spark.queries import load_all

    got = {
        r.doc: (r.n_bigrams, r.dsir_logweight)
        for r in load_all()["pipe-dsir"].spark(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()

    def buckets(text):
        t = text.strip().lower().split()
        out = []
        for i in range(len(t) - 1):
            g = f"{t[i]} {t[i+1]}"
            h = int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
            out.append(h % 64)
        return out

    raw_c = [0] * 64
    tgt_c = [0] * 64
    per_doc: dict[int, list] = {}
    for d in docs:
        if d.text is None or not d.text.strip():
            continue
        bs = buckets(d.text)
        per_doc[d.doc_id] = bs
        for b in bs:
            raw_c[b] += 1
            if d.lang == "en":
                tgt_c[b] += 1
    r_tot, t_tot = sum(raw_c), sum(tgt_c)
    lr = [
        math.log((tgt_c[b] + 1) / (t_tot + 64))
        - math.log((raw_c[b] + 1) / (r_tot + 64))
        for b in range(64)
    ]
    expect_docs = {doc for doc, bs in per_doc.items() if bs}
    assert set(got) == expect_docs
    for doc, bs in per_doc.items():
        if not bs:
            continue
        cnt = [0] * 64
        for b in bs:
            cnt[b] += 1
        w = 0.0
        for b in range(64):  # bucket-sorted fold, matching both engines
            if cnt[b]:
                w += cnt[b] * lr[b]
        n, z = got[doc]
        assert n == len(bs)
        assert abs(z - round(w, 6)) <= 1e-6, (doc, z, w)


def test_agg_affinity_matches_python(spark):
    """Third-engine differential: market-basket lift recomputed in pure
    Python over the distinct user-item incidence."""
    import json

    from itdb_spark.queries import load_all

    got = {
        (r.item_a, r.item_b): (r.c_ab, r.c_a, r.c_b, r.lift_milli)
        for r in load_all()["agg-affinity"].spark(spark, SF_DIR).collect()
    }
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    inc = set()
    for e in events:
        if e.user_id is None or e.props is None:
            continue
        k = json.loads(e.props).get("k")
        if k is not None:
            inc.add((e.user_id, int(k)))
    users = {u for u, _ in inc}
    item_c: dict[int, int] = {}
    by_user: dict = {}
    for u, i in inc:
        item_c[i] = item_c.get(i, 0) + 1
        by_user.setdefault(u, set()).add(i)
    pair_c: dict = {}
    for items in by_user.values():
        s = sorted(items)
        for x in range(len(s)):
            for y in range(x + 1, len(s)):
                pair_c[(s[x], s[y])] = pair_c.get((s[x], s[y]), 0) + 1
    want = {
        p: (c, item_c[p[0]], item_c[p[1]],
            1000 * len(users) * c // (item_c[p[0]] * item_c[p[1]]))
        for p, c in pair_c.items()
        if c >= 5
    }
    assert got == want


def test_agg_survival_matches_python_km(spark):
    """Third-engine differential: the Kaplan-Meier curve recomputed in
    pure Python (gap observations, terminal censoring, suffix risk
    sets, product-limit estimate) — plus the K-M invariants: surv is
    non-increasing in t and within (0, 1]."""
    import math

    from itdb_spark.queries import load_all

    got = {
        r.t_min: (r.n_risk, r.d, r.surv)
        for r in load_all()["agg-survival"].spark(spark, SF_DIR).collect()
    }
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_user: dict = {}
    for e in events:
        if e.ts is None or e.user_id is None:
            continue
        by_user.setdefault(e.user_id, []).append(
            int(e.ts.timestamp() * 1_000_000)
        )
    horizon = max(t for ts in by_user.values() for t in ts)
    obs = []  # (t_min, censored)
    for ts in by_user.values():
        ts.sort()
        for a, b in zip(ts, ts[1:]):
            obs.append(((b - a) // 60_000_000, 0))
        obs.append(((horizon - ts[-1]) // 60_000_000, 1))
    per_t: dict = {}
    for t, c in obs:
        d, tot = per_t.get(t, (0, 0))
        per_t[t] = (d + (1 - c), tot + 1)
    want = {}
    surv, at_risk = 1.0, len(obs)
    for t in sorted(per_t):
        d, tot = per_t[t]
        if d > 0:
            surv *= 1.0 - d / at_risk
            want[t] = (at_risk, d, round(surv, 6))
        at_risk -= tot
    assert set(got) == set(want)
    prev = 1.0 + 1e-12
    for t in sorted(got):
        n, d, s = got[t]
        wn, wd, ws = want[t]
        assert (n, d) == (wn, wd), (t, got[t], want[t])
        assert abs(s - ws) <= 1e-6, (t, s, ws)
        assert 0.0 <= s <= prev + 1e-9  # non-increasing, in [0, 1]
        prev = s
