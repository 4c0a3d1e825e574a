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

# Micro-int magnitude bound the split-matmul exactness proof assumes
# (|x| < 2²⁵ ⇒ hi = x >> 10 has |hi| ≤ 2¹⁵ ⇒ every float64 partial sum
# ≤ 2²²·2³⁰ = 2⁵² < 2⁵³ stays an exact integer). Real embeddings are
# micro-scaled from ~[-1, 1] (|x| ~ 2²⁰); 2²⁵ leaves 32× headroom.
_MAX_MICRO_ABS = 1 << 25


def _check_exact_bounds(n, max_a, max_b, what):
    """Joint exactness precondition for the split GEMMs (ADVICE r12).

    The per-value (< 2²⁵) and length (≤ 2²²) caps are each necessary
    but NOT jointly sufficient: a product entry is bounded by n·Ma·Mb,
    which the individual caps allow to reach 2²²·2²⁵·2²⁵ = 2⁷², past
    int64 — values ~3e7 at a 10k-row batch would wrap SILENTLY. The
    full proof needs, with M' = max(M, 2¹⁰) (the lo half is always
    < 2¹⁰ regardless of how small the values are):

    * n·M'a·M'b < 2⁶³ — every recombination term (hh·2²⁰, the shifted
      cross terms, and the true result) representable in int64;
    * n ≤ 2²² — with the above, every float64 partial sum (hh ≤
      n·M'aM'b/2²⁰ < 2⁴³; hl/lh ≤ n·M'aM'b/2¹⁰ < 2⁵³; ll ≤ n·2²⁰
      < 2⁴²) is an exact integer under any BLAS summation order.

    Real embeddings (M ~ 2²⁰) pass at the full 2²² batch cap:
    2²²·2⁴⁰ = 2⁶² < 2⁶³."""
    if n > _MAX_ARROW_BATCH_ROWS:
        raise ValueError(
            f"{what}: length {n} exceeds the exactness cap "
            f"{_MAX_ARROW_BATCH_ROWS}"
        )
    for m in (max_a, max_b):
        if m >= _MAX_MICRO_ABS:
            raise ValueError(
                f"{what}: micro value magnitude {m} breaks the exact "
                f"split-gemm bound {_MAX_MICRO_ABS}"
            )
    eff_a = max(max_a, 1 << 10)
    eff_b = max(max_b, 1 << 10)
    if n * eff_a * eff_b >= 1 << 63:
        raise ValueError(
            f"{what}: joint bound violated — {n} terms of magnitude "
            f"{max_a}x{max_b} can reach {n * eff_a * eff_b}, past "
            f"int64 (need n*max(|a|,2^10)*max(|b|,2^10) < 2^63)"
        )


def _exact_int_matmul(x):
    """XᵀX for an int64 (n, d) matrix, EXACTLY, at float64-BLAS speed.

    numpy routes integer matmul through a generic non-BLAS loop —
    measured 280x slower than the float64 GEMM (0.289 s vs 0.001 s per
    10k x 64 batch; this WAS the emb family's second decade, VERDICT
    r11 #5). Splitting x = hi·2¹⁰ + lo (arithmetic-shift floor split,
    lo ∈ [0, 2¹⁰)) gives XᵀX = 2²⁰·HᵀH + 2¹⁰·(HᵀL + (HᵀL)ᵀ) + LᵀL —
    three float64 GEMMs whose every addend and partial sum is an
    integer below 2⁵³ (bounds in _MAX_MICRO_ABS's note), so each float
    result is exactly representable REGARDLESS of BLAS summation order
    and converts back to int64 losslessly; the shift-recombination is
    pure int64. Not an approximation — ``_check_exact_bounds`` enforces
    the JOINT precondition the proof needs (rows·M'² < 2⁶³, not just
    the per-value cap — ADVICE r12)."""
    import numpy as np

    if x.size:
        mx = int(np.abs(x).max())
        _check_exact_bounds(x.shape[0], mx, mx, "exact split-matmul")
    hi = x >> 10
    lo = (x - (hi << 10)).astype(np.float64)
    hif = hi.astype(np.float64)
    hh = np.rint(hif.T @ hif).astype(np.int64)
    c = np.rint(hif.T @ lo).astype(np.int64)
    ll = np.rint(lo.T @ lo).astype(np.int64)
    return (hh << 20) + ((c + c.T) << 10) + ll


def exact_int_gemm(a, b):
    """A @ B for int64 matrices, EXACTLY, via four float64 GEMMs — the
    general (asymmetric) form of ``_exact_int_matmul``'s split: with
    A = Ah·2¹⁰ + Al and B = Bh·2¹⁰ + Bl (floor splits, |values| < 2²⁵
    guarded, inner dim ≤ the 2²² batch cap), every partial sum is an
    integer ≤ 2²²·2³⁰ = 2⁵² < 2⁵³, so each float GEMM is exact under
    any summation order and the int64 shift-recombination is lossless.
    Used by the kmeans assignment's -2·X·Cᵀ distance term (int64
    broadcast-subtract distances were the O(n·k·d) non-BLAS form).
    ``_check_exact_bounds`` enforces the joint precondition
    (inner·M'a·M'b < 2⁶³ plus the per-value and length caps —
    ADVICE r12: the independent caps alone admit 2⁷² products)."""
    import numpy as np

    ma = int(np.abs(a).max()) if a.size else 0
    mb = int(np.abs(b).max()) if b.size else 0
    _check_exact_bounds(a.shape[1], ma, mb, "exact split-gemm")
    ah = a >> 10
    al = (a - (ah << 10)).astype(np.float64)
    bh = b >> 10
    bl = (b - (bh << 10)).astype(np.float64)
    ahf = ah.astype(np.float64)
    bhf = bh.astype(np.float64)
    hh = np.rint(ahf @ bhf).astype(np.int64)
    hl = np.rint(ahf @ bl).astype(np.int64)
    lh = np.rint(al @ bhf).astype(np.int64)
    ll = np.rint(al @ bl).astype(np.int64)
    return (hh << 20) + ((hl + lh) << 10) + ll


def second_moment_partials(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-batch upper-triangle partial sums of micro-integer products:
    (i, j, s, c) with 1-based dims i <= j, s = Σ x_i·x_j over the
    batch's vectors that carry BOTH dims, c = their count. Sum s as
    DECIMAL(38,0) and c as BIGINT across batches for the exact global
    moments. NULL vectors are skipped; mixed lengths are handled by
    grouping rows per length inside the batch (a dim pair accumulates
    only from vectors long enough to have both).

    Round 12 (VERDICT r11 #5 — the emb second-decade attribution): the
    kernel is ``mapInArrow``, not mapInPandas. The pandas form spent
    its sf10 wall (4.2 s of emb-cov's 4.7 s) converting 2M Arrow list
    cells to numpy ONE ROW AT A TIME (np.asarray per vector + stack);
    Arrow transfer itself measured 0.34 s. Here the ListArray's values
    buffer is reshaped ZERO-COPY into the (rows, d) matrix whenever the
    batch is null-free and fixed-length (every real embedding corpus;
    the ragged/null fallback keeps the per-length grouping), so the
    only per-batch Python is one matmul — measured 4.2 s → 0.7 s at
    sf10, second decade 3.6x → ~1.6x on a scan-bound floor."""
    schema = "i long, j long, s long, c long"

    def work(batches):
        import numpy as np
        import pyarrow as pa

        def emit(mats):
            arrays = {k: [] for k in ("i", "j", "s", "c")}
            for d, (m, n) in mats.items():
                iu, ju = np.triu_indices(d)
                arrays["i"].append(iu.astype(np.int64) + 1)
                arrays["j"].append(ju.astype(np.int64) + 1)
                arrays["s"].append(m[iu, ju])
                arrays["c"].append(np.full(iu.shape, n, dtype=np.int64))
            cols = [
                np.concatenate(arrays[k])
                if arrays[k]
                else np.empty(0, dtype=np.int64)
                for k in ("i", "j", "s", "c")
            ]
            return pa.RecordBatch.from_arrays(
                [pa.array(c, type=pa.int64()) for c in cols],
                names=["i", "j", "s", "c"],
            )

        for batch in batches:
            # int64-exactness guard (ADVICE r11): the per-batch partial
            # sum for a dim pair is ≤ rows·(2²⁰)² = rows·2⁴⁰, which
            # stays inside int64 only while rows < 2²³. Arrow's default
            # cap (spark.sql.execution.arrow.maxRecordsPerBatch = 10k)
            # keeps batches far below that, but a session that raises
            # the config toward ~2²³ rows/batch would overflow the
            # partials SILENTLY — so fail loud instead (the kmeans
            # ragged-corpus precedent).
            if batch.num_rows > _MAX_ARROW_BATCH_ROWS:
                raise ValueError(
                    f"moments batch of {batch.num_rows} rows exceeds the "
                    f"int64-exactness cap {_MAX_ARROW_BATCH_ROWS} "
                    "(rows*2^40 must stay < 2^63); lower "
                    "spark.sql.execution.arrow.maxRecordsPerBatch"
                )
            col = batch.column(0)
            if isinstance(col, pa.ChunkedArray):  # pragma: no cover
                col = col.combine_chunks()
            offsets = np.asarray(col.offsets)
            lengths = np.diff(offsets)
            valid = (
                np.ones(batch.num_rows, dtype=bool)
                if col.null_count == 0
                else np.asarray(col.is_valid())
            )
            values = np.asarray(col.values, dtype=np.float64)
            mats: dict[int, tuple] = {}
            if col.null_count == 0 and lengths.size and (
                lengths == lengths[0]
            ).all():
                # fast path: null-free fixed-length batch — the values
                # buffer IS the row-major matrix (sliced through
                # [offsets[0], offsets[-1]): a sliced ListArray keeps
                # the FULL child buffer, so reshape must window it);
                # no per-row Python
                d = int(lengths[0])
                if d > 0:
                    x = np.floor(
                        values[offsets[0] : offsets[-1]].reshape(-1, d)
                        * MICRO
                        + 0.5
                    ).astype(np.int64)
                    mats[d] = (_exact_int_matmul(x), x.shape[0])
            else:
                starts = offsets[:-1]
                for d in np.unique(lengths[valid]):
                    d = int(d)
                    if d == 0:
                        continue
                    sel = starts[valid & (lengths == d)]
                    idx = (sel[:, None] + np.arange(d)[None, :]).ravel()
                    x = np.floor(
                        values[idx].reshape(-1, d) * MICRO + 0.5
                    ).astype(np.int64)
                    mats[d] = (_exact_int_matmul(x), x.shape[0])
            yield emit(mats)

    return emb.select(vec_col).mapInArrow(work, schema)


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
