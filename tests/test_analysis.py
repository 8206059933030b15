"""Pin the reference's semantic quirks Q2-Q5 (SURVEY §1.3) on tiny frames.

These mirror what the reference's analysis SQL does inside PostgreSQL
(/root/reference/etl_project/assets/sql/transform/stock_bars_analysis.sql)
— NULL cascades from LAG, nullif(0) division guard, rounding order, and
sample-stddev-of-one = NULL.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from stock_bars_data_engineering_project_spark.operators.analysis import bars_analysis


def _bars(spark, rows):
    return spark.createDataFrame(
        [Row(stock=s, timestamp=datetime.datetime(2025, 9, d), close=c) for s, d, c in rows]
    )


def test_first_row_null_cascade_q5(spark):
    df = _bars(spark, [("A", 1, 100.0), ("A", 2, 110.0)])
    out = bars_analysis(df).orderBy("date").collect()
    first, second = out
    assert first.prev_value is None
    assert first.return_pct is None
    assert first.moving_stddev is None  # stddev over {NULL} -> NULL (Q4+Q5)
    assert second.prev_value == 100.0
    assert second.return_pct == 10.0


def test_nullif_zero_guard_q2(spark):
    df = _bars(spark, [("A", 1, 0.0), ("A", 2, 50.0)])
    out = bars_analysis(df).orderBy("date").collect()
    assert out[1].prev_value == 0.0
    assert out[1].return_pct is None  # (50-0)/nullif(0,0) -> NULL, no error


def test_single_row_stddev_null_q4(spark):
    df = _bars(spark, [("SOLO", 1, 42.0)])
    row = bars_analysis(df).collect()[0]
    assert row.moving_stddev is None
    assert row.moving_avg == 42.0


def test_rounding_order_q3(spark):
    # return = (102.5-100)/100 = 0.025 -> round3 = 0.025 -> *100 -> 2.5 -> round1
    df = _bars(spark, [("A", 1, 100.0), ("A", 2, 102.5), ("A", 3, 102.5004)])
    out = bars_analysis(df).orderBy("date").collect()
    assert out[1].return_pct == 2.5
    # (102.5004-102.5)/102.5 = 3.9e-6 -> round3 = 0.0 -> pct 0.0 (not 0.00039)
    assert out[2].return_pct == 0.0


def test_moving_window_is_rows_not_range(spark):
    # 6 rows; moving_avg on row 6 covers rows 2..6 only (ROWS 4 PRECEDING)
    df = _bars(spark, [("A", d, float(d)) for d in range(1, 7)])
    out = bars_analysis(df).orderBy("date").collect()
    assert out[5].moving_avg == (2 + 3 + 4 + 5 + 6) / 5


def test_multi_key_partitioning(spark):
    df = _bars(spark, [("A", 1, 10.0), ("B", 1, 20.0), ("A", 2, 11.0), ("B", 2, 18.0)])
    out = {(r.stock, r.date.day): r for r in bars_analysis(df).collect()}
    assert out[("A", 2)].prev_value == 10.0
    assert out[("B", 2)].prev_value == 20.0
    assert out[("A", 1)].prev_value is None
