"""Python UDTF extension point (Spark 4 user-defined table functions).

Every registered operator keeps its logic in JVM-side expressions — the
UDTF here is the documented EXTENSION POINT for per-row generators that
genuinely cannot be expressed as higher-order column expressions
(external parsers, recursive descent over opaque formats): a lateral
`fn(...)` call that fans each input row out into a typed relation, the
same seat mapInPandas occupies for batch-shaped Python but with
per-row generator ergonomics and a declared row schema.

``chunk_walker`` intentionally reimplements fn-chunk-overlap's closed-
form chunk geometry so the equivalence test
(tests/test_operators.py::test_udtf_chunker_matches_expression_form)
can pin the UDTF path against the expression path over the real
corpus — if the extension point bit-rots (Arrow codec, UDTF API), CI
says so, not a user's pipeline.

Scale: a UDTF runs in the Python worker pool — Arrow-batched here via
``useArrow=True`` (the plain ``@udtf`` path pickles row-at-a-time:
``spark.sql.execution.pythonUDTF.arrow.enabled`` defaults to false and
the session factory only enables pandas-conversion Arrow), but still
off-JVM; use it only when expressions cannot express the
generator (the fn-chunk-overlap query itself stays the expression
form). Fan-out is bounded by each row's own geometry, exactly like the
expression form's explode(sequence(...)).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx: bigint, start: bigint, chunk_len: bigint", useArrow=True)
class chunk_walker:
    """(n_tokens, size, stride) -> one row per strided chunk: the
    overlap geometry 1 + ceil((n - size) / stride), short inputs one
    chunk — identical to fn-chunk-overlap's integer closed form."""

    def eval(self, n: int, size: int, stride: int):  # noqa: D102
        if size <= 0 or stride <= 0:
            # fail loudly — the expression form's geometry preconditions;
            # a non-advancing stride would otherwise loop the Python
            # worker forever
            raise ValueError(f"size and stride must be positive, got {size}/{stride}")
        if n is None or n <= 0:
            # match the expression form exactly: NULL text -> NULL n ->
            # sequence/explode emits NO rows (a phantom zero-chunk here
            # would break the pinned row-identity)
            return
        s, i = 0, 0
        while True:
            yield i, s, min(size, n - s)
            if s + size >= n:
                break
            s += stride
            i += 1
