"""Round-13 wave: joint exactness bounds for the split GEMMs, the
versioned-chain compaction policy, and the ANN ingest loop.

Reference parity notes cite arkarkark/itdb files as file:line."""

from __future__ import annotations

import numpy as np
import pytest


def test_exact_gemm_joint_bound_boundary():
    """ADVICE r12 (medium): the per-value (< 2^25) and length (<= 2^22)
    caps are individually satisfiable while n*Ma*Mb >= 2^63 — the int64
    recombination would wrap SILENTLY. The joint guard must (a) reject
    exactly that window, (b) still admit the boundary just below it,
    where the result is verified against arbitrary-precision integers
    (numpy object dtype — no float anywhere)."""
    from itdb_spark.operators.moments import (
        _MAX_MICRO_ABS,
        _exact_int_matmul,
        exact_int_gemm,
    )

    # The previously-silent window: values pass the per-value cap
    # (3.2e7 < 2^25 = 33,554,432) and the row cap, but
    # 10_000 * (3.2e7)^2 = 1.024e19 > 2^63 — pre-fix this wrapped to a
    # negative moment. Both kernels must refuse.
    v = 32_000_000
    x = np.full((10_000, 1), v, dtype=np.int64)
    with pytest.raises(ValueError, match="joint bound"):
        _exact_int_matmul(x)
    with pytest.raises(ValueError, match="joint bound"):
        exact_int_gemm(x.T.copy(), x)

    # Just below the joint bound: 9000 * (3.2e7)^2 = 9.216e18 < 2^63
    # (9.223e18). Must pass the guard AND equal the bigint product —
    # the largest-magnitude exact case the kernel admits.
    y = np.full((9_000, 1), v, dtype=np.int64)
    y[::2, 0] = -v  # exercise the arithmetic-shift floor split
    got = _exact_int_matmul(y)
    want = y.astype(object).T @ y.astype(object)
    assert (got.astype(object) == want).all()
    got_g = exact_int_gemm(y.T.copy(), y)
    assert (got_g.astype(object) == want).all()

    # The length cap is part of the joint proof (the ll float GEMM
    # needs n*2^20 < 2^53 independently of the value magnitudes).
    tall = np.ones((2, (1 << 22) + 1), dtype=np.int64)
    with pytest.raises(ValueError, match="exactness cap"):
        exact_int_gemm(tall, tall.T.copy())

    # Real-embedding envelope at the full batch cap stays admitted:
    # the guard change must not reject the workload it ships for
    # (M ~ 2^20 at 2^22 rows -> 2^62 < 2^63). Verify with the guard's
    # own arithmetic rather than allocating a 2^22-row matrix.
    eff = max(1 << 20, 1 << 10)
    assert (1 << 22) * eff * eff < (1 << 63)
    assert 1 << 20 < _MAX_MICRO_ABS
