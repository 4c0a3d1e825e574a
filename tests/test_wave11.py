"""Round-11 additions: the persisted-band-index serving twin for
incremental dedup (VERDICT r10 #6) — the dedup family's
build-once/probe-many split, mirroring what sim-knn-ivf-persist /
sim-knn-ivfpq-res already pin for the ANN family.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_incr_persist_bit_identical_to_rebuild(spark):
    """The persisted probe must be BIT-identical to the in-session
    rebuild AT THE SAME SPLIT, on BOTH hash paths: band_hash strings
    and doc ids round-trip parquet exactly, and batch-side
    filter-then-sign equals sign-then-filter (a signature depends only
    on its own text). This is the equivalence gate the registration's
    docstring promises. Also pins the batch semantics: every signed
    batch doc's exact copy sits in the index, so n_hit_bands is
    NUM_BANDS for every row under any hash."""
    from itdb_spark.operators.dedup import (
        NUM_BANDS,
        band_collision_counts,
        minhash_bands,
        minhash_signatures,
    )
    from itdb_spark.queries.pipeline import _dedup_incr_persist_impl, corpus

    for hash_fn in ("portable", "xxhash64"):
        bands = minhash_bands(
            minhash_signatures(
                corpus(spark, SF_DIR), "doc_id", "text", hash_fn=hash_fn
            )
        )
        rebuild = {
            tuple(r)
            for r in band_collision_counts(
                bands.where(F.col("doc") >= 200000),
                bands.where(F.col("doc") < 200000),
            ).collect()
        }
        persisted = {
            tuple(r)
            for r in _dedup_incr_persist_impl(spark, SF_DIR, hash_fn).collect()
        }
        assert persisted == rebuild, (
            f"{hash_fn}: persisted probe diverged from rebuild "
            f"({len(persisted)} vs {len(rebuild)} rows)"
        )
        assert rebuild, f"{hash_fn}: empty result proves nothing"
        assert all(n == NUM_BANDS for _, n in persisted), (
            "a batch doc missed bands despite an exact index copy"
        )


def test_persist_band_index_layout_and_refresh(spark, tmp_path):
    """persist_band_index publishes a hive-partitioned (band=N dirs)
    versioned table through the atomic-manifest kernel: read_current
    round-trips exactly, a refresh publishes v2 while v1 stays intact
    for pinned readers, and vacuum retention applies."""
    from itdb_spark.operators.dedup import (
        NUM_BANDS,
        minhash_bands,
        minhash_signatures,
        persist_band_index,
    )
    from itdb_spark.sinks import versioned as V

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    bands = minhash_bands(minhash_signatures(docs, "doc_id", "text"))
    root = str(tmp_path / "band_index")

    v1 = persist_band_index(bands, root)
    assert v1 == "v1" and V.current_version(root) == "v1"
    # hive layout: one band=N dir per band inside the version dir
    band_dirs = sorted(
        d for d in os.listdir(os.path.join(root, "v1"))
        if d.startswith("band=")
    )
    assert band_dirs == [f"band={b}" for b in range(NUM_BANDS)]
    # exact round-trip (partition column comes back typed)
    got = {
        (r.doc, r.band, r.band_hash)
        for r in V.read_current(spark, root).collect()
    }
    want = {(r.doc, r.band, r.band_hash) for r in bands.collect()}
    assert got == want

    # refresh: publish a smaller rebuild as v2; v1 remains readable
    v2 = persist_band_index(
        minhash_bands(
            minhash_signatures(docs.limit(10), "doc_id", "text")
        ),
        root,
    )
    assert v2 == "v2" and V.current_version(root) == "v2"
    assert V.read_current(spark, root).select("doc").distinct().count() <= 10
    assert spark.read.parquet(os.path.join(root, "v1")).count() == len(want)


def test_persisted_probe_scans_index_files(spark):
    """The amortized path's entire point: the timed probe plan reads the
    PERSISTED index from disk (a parquet scan of the index root) and
    computes signatures only for the batch — the index side must not
    re-derive bands from documents.parquet. Column pruning on the index
    scan: the probe needs (band, band_hash) keys only, so the data-file
    read schema must not fetch doc."""
    from itdb_spark.queries.pipeline import (
        _band_index_root,
        _dedup_incr_persist_impl,
    )

    probe = _dedup_incr_persist_impl(spark, SF_DIR, "portable")
    plan = probe._jdf.queryExecution().executedPlan().toString()
    root = _band_index_root(spark, SF_DIR, "portable")
    assert os.path.basename(os.path.dirname(root)) in plan, (
        f"index path missing from probe plan:\n{plan}"
    )
    # the index-side scan line mentions the index path; its ReadSchema
    # must carry band_hash only (doc pruned; band is a partition col)
    idx_lines = [
        ln for ln in plan.splitlines()
        if "band_idx" in ln and "ReadSchema" in ln
    ]
    assert idx_lines, f"no index scan with ReadSchema in plan:\n{plan}"
    for ln in idx_lines:
        assert "band_hash" in ln and "doc" not in ln.split("ReadSchema")[1], ln
