"""Physical layout: bucketed co-located joins, date-partition pruning."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from conftest import SF_SMOKE

from mongo_hadoop_spark.session import table
from mongo_hadoop_spark.sources.layout import (
    cobucketed_join, read_date_range, write_bucketed, write_date_partitioned,
)


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("wh")
    o = table(spark, SF_SMOKE, "orders")
    li = table(spark, SF_SMOKE, "lineitem")
    write_bucketed(o.withColumnRenamed("o_orderkey", "k"), "b_orders", "k", 8,
                   path=str(root / "b_orders"))
    write_bucketed(li.withColumnRenamed("l_orderkey", "k"), "b_lineitem", "k", 8,
                   path=str(root / "b_lineitem"))
    return root


def test_cobucketed_join_has_no_exchange(spark, warehouse):
    # at smoke scale Catalyst would broadcast (also shuffle-free, but not
    # the fact-to-fact case bucketing exists for) — disable it to get the
    # honest large-table plan: bucketed SortMergeJoin with NO Exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = cobucketed_join(spark, "b_orders", "b_lineitem", "k")
        plan = plan_of(df)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # sanity: it is a real join with real rows
        assert df.count() == table(spark, SF_SMOKE, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_unbucketed_join_does_exchange(spark):
    o = table(spark, SF_SMOKE, "orders").withColumnRenamed("o_orderkey", "k")
    li = table(spark, SF_SMOKE, "lineitem").withColumnRenamed("l_orderkey", "k")
    # force the general case (no broadcast) for an honest comparison
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(o.join(li, "k"))
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_date_partition_pruning(spark, tmp_path):
    events = table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "events_by_day")
    write_date_partitioned(events, path)
    df = read_date_range(spark, path, "2024-01-05", "2024-01-07")
    plan = plan_of(df)
    assert "PartitionFilters" in plan and "dt" in plan
    # pruning is real: only the two matching dt= dirs are read
    n_days = df.select("dt").distinct().count()
    assert n_days <= 2
    # correctness: matches a full-scan filter on the rendered date
    full = events.where(
        F.date_format("ts", "yyyy-MM-dd").between("2024-01-05", "2024-01-06"))
    assert df.count() == full.count()
