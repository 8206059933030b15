"""Misra-Gries heavy hitters (operators/heavy.py): the three guarantees
against exact counts on a skewed fixture and the real corpus, partition
robustness, and guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_bars_data_engineering_project_spark.operators.heavy import (
    merged_heavy_hitters,
    mg_summaries,
)
from stock_bars_data_engineering_project_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def _laws(spark, df, item_col, k, phi):
    exact = {
        r[item_col]: r["cnt"]
        for r in df.groupBy(item_col).agg(F.count(F.lit(1)).alias("cnt")).collect()
        if r[item_col] is not None
    }
    n = sum(exact.values())
    summaries = mg_summaries(df, item_col, k=k)
    summaries.persist()
    cand_df, budget = merged_heavy_hitters(summaries)
    cand = {r.item: r.lo for r in cand_df.collect()}
    total_d = budget.first().total_d
    # budget law: the union decrement is at most n/(k+1)
    assert total_d <= n // (k + 1) + 1
    # superset: every item above n/phi is a candidate (phi <= k)
    for item, c in exact.items():
        if c * phi > n:
            assert item in cand, item
    # bounds: lo <= true <= lo + total_d for every candidate
    for item, lo in cand.items():
        assert lo <= exact[item] <= lo + total_d, item
    # size: every partition kept at most k counters
    per_pid = (
        summaries.filter(F.col("item").isNotNull()).groupBy("pid").count().collect()
    )
    assert all(r["count"] <= k for r in per_pid)
    summaries.unpersist()


def test_mg_laws_on_skewed_fixture(spark):
    # zipf-ish: item i appears ~1000/i times, across many partitions
    rows = [(f"w{i}",) for i in range(1, 40) for _ in range(1000 // i)]
    df = spark.createDataFrame(rows, "item string").repartition(16)
    _laws(spark, df, "item", k=16, phi=10)


def test_mg_laws_on_real_corpus(spark):
    docs = load_table(spark, SF, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    ).filter(F.col("token") != "")
    _laws(spark, toks, "token", k=64, phi=25)


def test_mg_null_items_ignored_and_guard(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",)], "item string")
    cand, budget = merged_heavy_hitters(mg_summaries(df, "item", k=4))
    got = {r.item: r.lo for r in cand.collect()}
    assert got == {"a": 2}
    assert budget.first().total_d == 0
    with pytest.raises(ValueError, match="k must be positive"):
        mg_summaries(df, "item", k=0)
