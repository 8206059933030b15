"""Bucketed-table planning: the write-once shuffle must be elided from
every downstream join AND aggregation on the bucket key. (The
co-bucketed join's no-Exchange pin also lives in test_maintenance.py;
this file adds the aggregation path, the bucketed-scan metadata, and
result equality vs the plain-join plan.)"""

from __future__ import annotations

import io
from contextlib import contextmanager, redirect_stdout

import pytest
from pyspark.sql import functions as F

from stock_bars_data_engineering_project_spark.sinks.bucketed import (
    co_bucketed_join,
    write_bucketed,
)
from stock_bars_data_engineering_project_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def _plan(df):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@contextmanager
def _conf(spark, key, value):
    old = spark.conf.get(key)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        spark.conf.set(key, old)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    write_bucketed(orders, "bt_orders", ("o_orderkey",), 8, ("o_orderkey",))
    write_bucketed(lineitem, "bt_lineitem", ("l_orderkey",), 8, ("l_orderkey",))
    yield
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")


def test_cobucketed_join_scans_carry_bucket_metadata(spark, bucketed_tables):
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        j = spark.table("bt_orders").join(
            spark.table("bt_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = _plan(j)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    assert plan.count("Bucketed: true") == 2


def test_bucket_key_aggregate_plans_no_exchange(spark, bucketed_tables):
    # bucketing satisfies the aggregation's clustered distribution too —
    # a daily groupBy on the bucket key never shuffles the fact table
    agg = (
        spark.table("bt_lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    plan = _plan(agg)
    assert "Exchange" not in plan, plan


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    plain = (
        load_table(spark, SF, "orders")
        .join(
            load_table(spark, SF, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bucketed = (
        co_bucketed_join(
            spark,
            "bt_orders",
            "bt_lineitem",
            on=[F.col("o_orderkey") == F.col("l_orderkey")],
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, bucketed.collect())
    )
