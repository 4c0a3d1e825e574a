#!/usr/bin/env python
"""Round-14 fixed-batch ingest measurement (r13 VERDICT #2): the
trilogy's 100 TB claim is "per-trigger cost bounded by the BATCH", but
every r13 SCALE row drove an SF-PROPORTIONAL batch (the micro-batch is
corpus/9 by construction), so per-trigger walls grew with corpus and
the flatness claim was argued from per-stage linearity, not measured.

This holds the batch CONSTANT — the sf0.1 slice of each family's batch
pool — and drives it against corpora at sf0.1 / sf1.0 / sf10:

  minhash family (stream-minhash-ingest-live's stages):
    build   — persist_band_index over the corpus (one-time, grows
              with corpus BY DESIGN; reported for contrast)
    screen  — band_collision_counts_persisted(batch) vs the chain
    accept  — append_band_index(batch): member delta + novel-keys
              delta + atomic tag

  ann family (stream-ann-ingest-live's stages):
    build   — build_ivf_index + persist_ivf_index_versioned (one-time)
    assign_publish — append_ivf_index(batch): frozen-centroid assign
              + delta publish
    serve   — ivf_search_chain(fixed 15-query set, k=5, n_probe=3)

  containment family (stream-contain-live's stages):
    build   — persist_containment_index over the corpus (one-time)
    probe   — containment_probe_persisted(batch) vs the chain
    accept  — append_containment_index(batch): delta ranked under the
              frozen v1 order + atomic tag

If screen/accept/assign_publish/serve are near-flat across the two
decades while build grows ~linearly, the amortization split is proven
at fixed batch — the number a production ingest SLA needs. Any stage
that grows with corpus at fixed batch is a bug to name.

The fixed batch is materialized to parquet once and re-read per SF so
its plan carries no lineage into the corpus frames. Batch ids stay
disjoint from every corpus's ids by the mod conventions (docs:
% 300000 >= 200000 vs corpus < 200000; vectors: % 5 == 4 vs corpus
!= 4 — make_scale_dir's replica shifts are multiples of the moduli).

Screen/serve are best-of-2 (immutable chain between runs); build and
the accept/publish legs are single-run (they mutate the chain — a
second run would measure a different chain shape).

Env: $SCALE_SFS comma-list filters the corpus dirs (default all 3).
Prints one JSON line per (family, sf_dir).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from itdb_spark.session import get_spark

BASE_SF = "/root/testdata/sf0.1"
ALL_SFS = ["/root/testdata/sf0.1", "/root/repo/.scale/sf1.0", "/root/repo/.scale/sf10"]


def timed(f):
    t0 = time.perf_counter()
    f()
    return round(time.perf_counter() - t0, 3)


def best2(f):
    return min(timed(f), timed(f))


def main() -> None:
    sfs = [
        d for d in ALL_SFS
        if not os.environ.get("SCALE_SFS")
        or any(tok in d for tok in os.environ["SCALE_SFS"].split(","))
    ]
    spark = get_spark("ingest_fixed_batch_r14", cpus=32)

    from itdb_spark.operators.dedup import (
        append_band_index,
        append_containment_index,
        band_collision_counts_persisted,
        containment_probe_persisted,
        minhash_bands,
        minhash_signatures,
        persist_band_index,
        persist_containment_index,
    )
    from itdb_spark.operators.ivf import (
        append_ivf_index,
        build_ivf_index,
        ivf_search_chain,
        persist_ivf_index_versioned,
    )
    from itdb_spark.queries.pipeline import corpus

    work = tempfile.mkdtemp(prefix="itdb_fixed_batch_")
    try:
        # ---- fixed batches, staged once from the BASE SF ----
        doc_batch_path = os.path.join(work, "doc_batch")
        corpus(spark, BASE_SF).where(
            (F.col("doc_id") % 300000 >= 200000)
            & (F.expr("doc_id DIV 7") % 3 == 0)
        ).select("doc_id", "text").write.parquet(doc_batch_path)
        doc_batch = spark.read.parquet(doc_batch_path)
        doc_batch_rows = doc_batch.count()

        contain_batch_path = os.path.join(work, "contain_batch")
        corpus(spark, BASE_SF).where(
            (F.col("doc_id") % 5 == 4) & (F.expr("doc_id DIV 5") % 3 == 0)
        ).select("doc_id", "text").write.parquet(contain_batch_path)
        contain_batch = spark.read.parquet(contain_batch_path)
        contain_batch_rows = contain_batch.count()

        emb = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
        vec_batch_path = os.path.join(work, "vec_batch")
        emb.where(
            (F.col("vec_id") % 5 == 4) & (F.expr("vec_id DIV 5") % 3 == 0)
        ).write.parquet(vec_batch_path)
        vec_batch = spark.read.parquet(vec_batch_path)
        vec_batch_rows = vec_batch.count()
        queries_path = os.path.join(work, "queries")
        emb.where(F.col("vec_id") < 15).write.parquet(queries_path)
        queries = spark.read.parquet(queries_path)

        for sf_dir in sfs:
            # ---- minhash ----
            root = os.path.join(
                work, "band_" + sf_dir.strip("/").replace("/", "_")
            )
            base = corpus(spark, sf_dir).where(
                F.col("doc_id") % 300000 < 200000
            )
            row = {
                "family": "minhash",
                "sf_dir": sf_dir,
                "batch_rows": doc_batch_rows,
            }
            row["build"] = timed(
                lambda: persist_band_index(
                    minhash_bands(
                        minhash_signatures(base, "doc_id", "text")
                    ),
                    root,
                )
            )
            bands = minhash_bands(
                minhash_signatures(doc_batch, "doc_id", "text")
            )
            row["screen"] = best2(
                lambda: band_collision_counts_persisted(
                    spark, root, bands
                ).write.format("noop").mode("overwrite").save()
            )
            row["accept"] = timed(
                lambda: append_band_index(
                    spark, root, bands, tag="fixed-batch"
                )
            )
            print(json.dumps(row), flush=True)

            # ---- containment ----
            croot = os.path.join(
                work, "contain_" + sf_dir.strip("/").replace("/", "_")
            )
            cbase = corpus(spark, sf_dir).where(F.col("doc_id") % 5 != 4)
            row = {
                "family": "containment",
                "sf_dir": sf_dir,
                "batch_rows": contain_batch_rows,
            }
            row["build"] = timed(
                lambda: persist_containment_index(
                    cbase, "doc_id", "text", croot
                )
            )
            row["probe"] = best2(
                lambda: containment_probe_persisted(
                    spark, croot, contain_batch, "doc_id", "text"
                ).write.format("noop").mode("overwrite").save()
            )
            row["accept"] = timed(
                lambda: append_containment_index(
                    spark, croot, contain_batch, "doc_id", "text",
                    tag="fixed-batch",
                )
            )
            print(json.dumps(row), flush=True)

            # ---- ann ----
            emb_sf = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            vroot = os.path.join(
                work, "ivf_" + sf_dir.strip("/").replace("/", "_")
            )
            vbase = emb_sf.where(F.col("vec_id") % 5 != 4)
            row = {
                "family": "ann",
                "sf_dir": sf_dir,
                "batch_rows": vec_batch_rows,
            }

            def _build():
                assignments, centroids = build_ivf_index(vbase, k=8)
                persist_ivf_index_versioned(assignments, centroids, vroot)

            row["build"] = timed(_build)
            row["assign_publish"] = timed(
                lambda: append_ivf_index(
                    spark, vroot, vec_batch, tag="fixed-batch"
                )
            )
            row["serve"] = best2(
                lambda: ivf_search_chain(
                    spark, vroot, queries, k=5, n_probe=3
                ).write.format("noop").mode("overwrite").save()
            )
            print(json.dumps(row), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
