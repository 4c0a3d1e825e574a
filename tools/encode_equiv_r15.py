#!/usr/bin/env python
"""One-shot equivalence probe: expression-form pq_encode vs the join
form, on real embeddings (sf0.01) and an adversarial edge frame (zero
vectors, exact-tie vectors that sit equidistant between two centroids,
odd ids). Exits nonzero on any mismatch."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from itdb_spark.session import get_spark


def rows_of(df):
    return sorted((r.id, list(r.codes) if r.codes is not None else None)
                  for r in df.collect())


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("encode_equiv_r15")
    from itdb_spark.operators.pq import _pq_encode_join, pq_encode, train_pq

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cb = train_pq(emb, m=16, k=16, iters=3)
    new = rows_of(pq_encode(emb, cb))
    old = rows_of(_pq_encode_join(emb, cb, "vec_id", "embedding", 64, True, 16))
    assert new == old, f"real-corpus mismatch: {len(new)} vs {len(old)} rows"
    print(f"real corpus OK ({len(new)} rows)")

    # edge frame: zero vector (dropped by _normalize on both paths),
    # exact ties (vector equidistant between two centroids -> code
    # tie-break), tiny dim=4 / m=2 / k=2
    edge = spark.createDataFrame(
        [
            (1, [0.0, 0.0, 0.0, 0.0]),          # zero vector
            (2, [1.0, 0.0, 0.0, 1.0]),
            (3, [0.0, 1.0, 1.0, 0.0]),
            (4, [1.0, 1.0, 1.0, 1.0]),          # equidistant after norm
            (5, [-1.0, 2.0, -2.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    cb2 = train_pq(edge, m=2, k=2, iters=2)
    new2 = rows_of(pq_encode(edge, cb2, dim=4))
    old2 = rows_of(_pq_encode_join(edge, cb2, "vec_id", "embedding", 4, True, 2))
    assert new2 == old2, f"edge mismatch: {new2} vs {old2}"
    print(f"edge frame OK ({new2})")

    # residual path shape: normalize=False over an already-derived frame
    resid = edge.where(F.col("vec_id") > 1).select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x - F.lit(0.25)).alias("vec"),
    )
    new3 = rows_of(pq_encode(resid, cb2, "id", "vec", dim=4, normalize=False))
    old3 = rows_of(_pq_encode_join(resid, cb2, "id", "vec", 4, False, 2))
    assert new3 == old3, f"residual mismatch: {new3} vs {old3}"
    print(f"residual frame OK ({new3})")
    spark.stop()


if __name__ == "__main__":
    main()
