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
