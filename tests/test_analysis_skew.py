"""Two-phase skew-safe window (operators/analysis.bars_analysis_two_phase):
bit-for-bit equality with the single-window plan on a hot-key fixture,
boundary repair across sparse/gapped buckets, and the loud precondition
guard for buckets too small to carry a full frame."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from stock_bars_data_engineering_project_spark.operators.analysis import (
    bars_analysis,
    bars_analysis_two_phase,
)

def _bucket():
    return F.date_trunc("day", F.col("timestamp"))


def _bars(spark, rows):
    return spark.createDataFrame(
        rows, "stock string, timestamp timestamp, close double"
    )


def _skewed_fixture(spark, n_hot=400, n_cold_keys=8, per_cold=50):
    """One ticker holds ~50% of all rows (the documented window-skew
    hazard), spread over many day buckets; cold keys have a few rows
    per bucket."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(n_hot):
        # ~27 rows per day bucket for the hot key
        rows.append(
            ("HOT", t0 + datetime.timedelta(minutes=53 * i), 100.0 + (i * 7) % 31)
        )
    for k in range(n_cold_keys):
        for i in range(per_cold):
            rows.append(
                (
                    f"C{k}",
                    t0 + datetime.timedelta(minutes=17 + 211 * i + k),
                    50.0 + (i * 13 + k) % 23,
                )
            )
    return _bars(spark, rows)


def _canon(df):
    return sorted(map(tuple, df.collect()))


def test_two_phase_equals_single_window_on_hot_key(spark):
    df = _skewed_fixture(spark)
    single = bars_analysis(df)
    two = bars_analysis_two_phase(df, _bucket())
    assert _canon(two) == _canon(single)


def test_two_phase_handles_gapped_buckets(spark):
    """Bucket ids with holes (a quiet week): carry must come from the
    previous PRESENT bucket, not bucket_id - 1."""
    t0 = datetime.datetime(2024, 3, 1)
    rows = []
    for day in (0, 1, 9, 10):  # gap between day 1 and day 9
        for i in range(7):
            rows.append(
                ("A", t0 + datetime.timedelta(days=day, hours=i), 10.0 + day + i)
            )
    df = _bars(spark, rows)
    assert _canon(bars_analysis_two_phase(df, _bucket())) == _canon(bars_analysis(df))


def test_two_phase_first_bucket_smaller_than_frame_ok(spark):
    """An undersized FIRST bucket is legitimate — nothing exists before
    it, so its short carry is the complete history."""
    t0 = datetime.datetime(2024, 3, 1)
    rows = [("A", t0 + datetime.timedelta(hours=20 + i), 5.0 + i) for i in range(2)]
    rows += [
        ("A", t0 + datetime.timedelta(days=1, hours=i), 9.0 + i) for i in range(8)
    ]
    df = _bars(spark, rows)
    assert _canon(bars_analysis_two_phase(df, _bucket())) == _canon(bars_analysis(df))


def test_two_phase_raises_on_sparse_middle_bucket(spark):
    """A middle bucket with < frame_rows rows would need carry from two
    buckets back — the plan must refuse loudly, not return silently
    wrong boundary frames."""
    t0 = datetime.datetime(2024, 3, 1)
    rows = [("A", t0 + datetime.timedelta(hours=i), 5.0 + i) for i in range(8)]
    rows += [("A", t0 + datetime.timedelta(days=1, hours=1), 50.0)]  # 1-row bucket
    rows += [
        ("A", t0 + datetime.timedelta(days=2, hours=i), 9.0 + i) for i in range(8)
    ]
    df = _bars(spark, rows)
    with pytest.raises(Exception, match="two_phase"):
        bars_analysis_two_phase(df, _bucket()).collect()


def test_two_phase_guard_survives_column_pruning(spark):
    """The sparse-bucket guard must fire even when the caller projects
    away every repaired value column — an earlier revision rode the
    raise_error on the `value` column, which Catalyst pruned with it."""
    t0 = datetime.datetime(2024, 3, 1)
    rows = [("A", t0 + datetime.timedelta(hours=i), 5.0 + i) for i in range(8)]
    rows += [("A", t0 + datetime.timedelta(days=1, hours=1), 50.0)]
    rows += [
        ("A", t0 + datetime.timedelta(days=2, hours=i), 9.0 + i) for i in range(8)
    ]
    df = _bars(spark, rows)
    with pytest.raises(Exception, match="two_phase"):
        bars_analysis_two_phase(df, _bucket()).select("stock").collect()
