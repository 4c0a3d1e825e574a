"""Oracle-checked query registry.

Every operator from SURVEY.md §2 (plus the training-data-pipeline
extensions) registers here as a named query: a Spark callable
``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible, an ANSI-SQL
twin that DuckDB runs over the same parquet tables. The driver compares the
two (row count + schema + order-insensitive value hash), so:

* every computed/aggregate column is aliased identically on both sides;
* float aggregation uses integer-cents arithmetic or explicit rounding so
  summation order cannot perturb the hash;
* any ordering that feeds LIMIT / window functions carries a full
  deterministic tie-break.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    id: str
    spark: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str  # reference citation / description
    bench: bool = False  # include in bench.py headline set
    # Deploy-grade variant for the bench ONLY: same operator, the hash /
    # config a real cluster would run (e.g. xxhash64 shingle hashes
    # instead of the md5-prefix portable hash the DuckDB gate needs to
    # reproduce buckets bit-for-bit). CORRECTNESS always grades `spark`;
    # bench.py times `bench_spark or spark` — the bench should measure
    # the plan production would run, not the oracle-portability harness.
    # Equivalence of the two paths is recall-gated in test_scale_paths.
    bench_spark: SparkQuery | None = None
    # Grading deferral: while the newest committed CORRECTNESS round is
    # BELOW this number, a never-graded entry sorts LAST in the grading
    # queue instead of first — so a query registered mid-round cannot
    # displace the round's planned window (which can be exactly full).
    # Once a CORRECTNESS_r{N}.json with N >= defer_after lands, the
    # deferral expires by construction (no cleanup, nothing to go stale)
    # and the entry fronts the queue as ordinary never-graded. 0 = never
    # defer. Graded entries ignore this field entirely.
    defer_after: int = 0


REGISTRY: dict[str, Query] = {}


def register(
    id: str,
    oracle: str | None = None,
    doc: str = "",
    bench: bool = False,
    bench_spark: SparkQuery | None = None,
    defer_after: int = 0,
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if id in REGISTRY:
            raise ValueError(f"duplicate query id {id!r}")
        REGISTRY[id] = Query(
            id=id,
            spark=fn,
            oracle=oracle,
            doc=doc or (fn.__doc__ or ""),
            bench=bench,
            bench_spark=bench_spark,
            defer_after=defer_after,
        )
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query module so REGISTRY is fully populated."""
    from itdb_spark.queries import (  # noqa: F401
        aggregates,
        analytics,
        extras,
        filters,
        joins,
        pipeline,
        scans,
        setops,
        sorts,
        streamingq,
        windows,
    )

    return REGISTRY
