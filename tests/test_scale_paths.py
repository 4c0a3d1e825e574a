"""Scale-path proofs that don't show up in oracle checks: bucketed
zero-shuffle joins, salted-agg equivalence, explain-plan assertions
(pushdown, broadcast, partial agg)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Write lineitem+orders bucketed by the join key → the join plans with
    NO Exchange on either side (the 100 TB fact-fact strategy, SCALE.md)."""
    # spark.sql.warehouse.dir is static — bucketed tables land in
    # ./spark-warehouse (gitignored); DROP TABLE below removes the files.
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketdemo")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select("l_orderkey", "l_quantity")
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet").select("o_orderkey", "o_orderpriority")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(
        "bucketdemo.li_b"
    )
    od.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
        "bucketdemo.od_b"
    )
    # disable broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bucketdemo.li_b").join(
            spark.table("bucketdemo.od_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert j.count() > 0
        plan = _physical_plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS bucketdemo.li_b")
        spark.sql("DROP TABLE IF EXISTS bucketdemo.od_b")
        spark.sql("DROP DATABASE IF EXISTS bucketdemo")


def test_salted_agg_equivalence(spark):
    from itdb_spark.operators.skew import salted_count

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plain = {
        (r.l_returnflag,): r.cnt
        for r in li.groupBy("l_returnflag").agg(F.count("*").alias("cnt")).collect()
    }
    salted = {
        (r.l_returnflag,): r.cnt
        for r in salted_count(li, ["l_returnflag"]).collect()
    }
    assert plain == salted


def test_pushdown_and_pruning(spark):
    """The 2-column projection + filter reaches the parquet scan."""
    df = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_quantity")
    )
    plan = _physical_plan(df)
    assert "PushedFilters" in plan and "l_returnflag" in plan.split("PushedFilters")[1][:200]
    # ReadSchema carries only the needed columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema


def test_broadcast_dim_join(spark):
    from itdb_spark.queries import load_all

    df = load_all()["join-left"].spark(spark, SF_DIR)
    assert "BroadcastHashJoin" in _physical_plan(df)


def test_partial_aggregation_before_shuffle(spark):
    from itdb_spark.queries import load_all

    df = load_all()["agg-pl-stats"].spark(spark, SF_DIR)
    plan = _physical_plan(df)
    # map-side combine: a partial_count HashAggregate below the Exchange
    assert "partial_count" in plan


def test_range_join_bucketized_equals_naive(spark):
    """The bucketized range join (shuffle on bucket ids) returns exactly
    the naive cross-join-filter result."""
    from itdb_spark.operators.rangejoin import range_join_count, range_join_naive

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    intervals = orders.where(F.col("o_orderkey") % 151 == 0).select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderdate").alias("start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")).alias("end"),
    )
    points = lineitem.select("l_shipdate")
    fast = {
        (r.orderkey, r.cnt)
        for r in range_join_count(points, intervals, "l_shipdate", "start", "end", "orderkey").collect()
    }
    naive = {
        (r.orderkey, r.cnt)
        for r in range_join_naive(points, intervals, "l_shipdate", "start", "end", "orderkey").collect()
    }
    assert fast == naive and len(fast) > 0


def test_topk_uses_group_limit(spark):
    from itdb_spark.queries import load_all

    df = load_all()["win-topk-group"].spark(spark, SF_DIR)
    assert "WindowGroupLimit" in _physical_plan(df)
