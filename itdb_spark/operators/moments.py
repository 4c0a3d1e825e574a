"""Exact second-moment kernels over the embedding column.

The d×d uncentered second-moment matrix M = XᵀX (micro-integer values,
the emb-dimstats half-up rule) underlies emb-cov, emb-pca and the
whitening family. Two implementations with IDENTICAL integer semantics:

* the in-row higher-order-expression expansion (emb-cov's original
  form — zero Python, but Catalyst evaluates the nested transform
  lambdas INTERPRETED per element: d(d+1)/2 struct builds per row,
  measured ~5× per 10× data in its second decade at sf10 because the
  416M-element evaluation dominates);
* ``second_moment_partials`` below — Arrow-batched numpy: one int64
  matmul per batch replaces ~21M interpreted lambda evaluations
  (d=64, 10k-row batch). Exactness is unconditional, not a float
  accident: inputs are micro integers |x| ≤ ~2²⁰, per-batch partial
  sums are ≤ batch_rows·10¹² ≤ 10¹⁶ (Arrow caps batches at 10k rows)
  — inside int64 — and the cross-batch fold is a DECIMAL(38,0) sum in
  the JVM. Summation ORDER is irrelevant for integers, so the parity
  argument that keeps float dot products sequential (sim-maxsim)
  does not apply here.

At 100 TB: the moment pass is one map-side-combined aggregation — the
partials frame carries ≤ 2,080 rows per Arrow batch and the shuffle
carries 2,080 groups regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000

# Largest Arrow batch for which the int64 partial sums are provably
# exact: rows·2⁴⁰ < 2⁶³ ⟺ rows < 2²³; 2²² leaves a 2× safety margin
# over the worst-case micro-int magnitude bound.
_MAX_ARROW_BATCH_ROWS = 1 << 22


def second_moment_partials(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-batch upper-triangle partial sums of micro-integer products:
    (i, j, s, c) with 1-based dims i <= j, s = Σ x_i·x_j over the
    batch's vectors that carry BOTH dims, c = their count. Sum s as
    DECIMAL(38,0) and c as BIGINT across batches for the exact global
    moments. NULL vectors are skipped; mixed lengths are handled by
    grouping rows per length inside the batch (a dim pair accumulates
    only from vectors long enough to have both)."""
    schema = "i long, j long, s long, c long"

    def work(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            # int64-exactness guard (ADVICE r11): the per-batch partial
            # sum for a dim pair is ≤ rows·(2²⁰)² = rows·2⁴⁰, which
            # stays inside int64 only while rows < 2²³. Arrow's default
            # cap (spark.sql.execution.arrow.maxRecordsPerBatch = 10k)
            # keeps batches far below that, but a session that raises
            # the config toward ~2²³ rows/batch would overflow the
            # partials SILENTLY — so fail loud instead (the kmeans
            # ragged-corpus precedent).
            if len(pdf) > _MAX_ARROW_BATCH_ROWS:
                raise ValueError(
                    f"moments batch of {len(pdf)} rows exceeds the "
                    f"int64-exactness cap {_MAX_ARROW_BATCH_ROWS} "
                    "(rows*2^40 must stay < 2^63); lower "
                    "spark.sql.execution.arrow.maxRecordsPerBatch"
                )
            by_len: dict[int, list] = {}
            for v in pdf[vec_col]:
                if v is None:
                    continue
                a = np.asarray(v, dtype=np.float64)
                by_len.setdefault(a.shape[0], []).append(a)
            rows = []
            for d, vs in by_len.items():
                if d == 0:
                    continue
                x = np.floor(np.stack(vs) * MICRO + 0.5).astype(np.int64)
                m = x.T @ x  # exact: int64 matmul of micro ints
                iu, ju = np.triu_indices(d)
                n = np.int64(len(vs))
                rows.append(
                    pd.DataFrame(
                        {
                            "i": iu + 1,
                            "j": ju + 1,
                            "s": m[iu, ju],
                            "c": np.full(iu.shape, n),
                        }
                    )
                )
            if rows:
                yield pd.concat(rows, ignore_index=True)
            else:
                yield pd.DataFrame(
                    {"i": [], "j": [], "s": [], "c": []}, dtype="int64"
                )

    return emb.select(vec_col).mapInPandas(work, schema)


def second_moments(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Global exact upper-triangle moments: (i, j, n_vecs BIGINT,
    s DECIMAL(38,0)) — the kernel emb-cov/emb-pca consume."""
    return (
        second_moment_partials(emb, id_col, vec_col)
        .groupBy("i", "j")
        .agg(
            F.sum("c").cast("long").alias("n_vecs"),
            F.sum(F.col("s").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("s"),
        )
    )
