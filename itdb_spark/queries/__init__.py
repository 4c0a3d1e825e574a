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


REGISTRY: dict[str, Query] = {}


def register(
    id: str, oracle: str | None = None, doc: str = "", bench: bool = False
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if id in REGISTRY:
            raise ValueError(f"duplicate query id {id!r}")
        REGISTRY[id] = Query(id=id, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), bench=bench)
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
