"""Dataset statistics: approx sketches vs exact, within documented bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_bars_data_engineering_project_spark.sources.readers import load_table

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_error_bound(spark):
    events = load_table(spark, SF, "events")
    exact = events.select(F.countDistinct("user_id")).first()[0]
    approx = events.select(
        F.approx_count_distinct("user_id", rsd=0.02)
    ).first()[0]
    assert abs(approx - exact) / exact < 0.05  # HLL++ at rsd=0.02


def test_approx_percentile_error_bound(spark):
    events = load_table(spark, SF, "events")
    exact = events.select(F.expr("percentile(value, 0.95D)")).first()[0]
    approx = events.select(
        F.expr("approx_percentile(value, 0.95D, 10000)")
    ).first()[0]
    assert abs(approx - exact) <= abs(exact) * 0.01 + 1e-9


def test_stable_split_deterministic_and_stable(spark):
    from stock_bars_data_engineering_project_spark.operators.sampling import (
        deterministic_sample,
        stable_split,
    )

    docs = load_table(spark, SF, "documents")
    a = {r.doc_id: r.split for r in stable_split(docs).select("doc_id", "split").collect()}
    b = {r.doc_id: r.split for r in stable_split(docs).select("doc_id", "split").collect()}
    assert a == b  # run-to-run deterministic

    # growing the corpus never moves an existing row's split
    grown = stable_split(docs.limit(100))
    g = {r.doc_id: r.split for r in grown.select("doc_id", "split").collect()}
    assert all(a[k] == v for k, v in g.items())

    # proportions roughly honored
    from collections import Counter
    c = Counter(a.values())
    n = sum(c.values())
    assert 0.85 < c["train"] / n < 0.95
    assert c["val"] > 0 and c["test"] > 0

    # sample is a strict subset rule, consistent with buckets
    s = deterministic_sample(docs, 0.25)
    assert 0.15 < s.count() / docs.count() < 0.35
