"""Unit tests: benchmark-contamination overlap and the interval join
(batch semantics of the stream-stream join)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from stock_bars_data_engineering_project_spark.operators.contamination import (
    contamination_overlap,
)
from stock_bars_data_engineering_project_spark.streaming.joins import interval_join


def test_contamination_flags_only_overlapping_docs(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words here padding more tokens"),
            (3, "quick brown fox appears again in this text"),
        ],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame(
        [(100, "the quick brown fox ran away")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in contamination_overlap(corpus, benchmark).collect()}
    # doc 2 shares no 3-gram with the benchmark -> absent
    assert set(got) == {1, 3}
    # doc 1 shares "the quick brown" and "quick brown fox"
    assert got[1].n_overlap == 2
    assert got[3].n_overlap == 1  # "quick brown fox"
    for r in got.values():
        assert 0 < r.contamination <= 1.0


def test_interval_join_bounds_are_inclusive(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, minutes, etype):
        return (eid, 7, t0 + dt.timedelta(minutes=minutes), etype)

    events = spark.createDataFrame(
        [
            ev(1, 0, "purchase"),
            ev(10, -60, "view"),   # exactly max_lag before -> included
            ev(11, -61, "view"),   # just beyond -> excluded
            ev(12, 0, "view"),     # same instant -> included
            ev(13, 1, "view"),     # after the purchase -> excluded
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    purchases = events.filter(F.col("event_type") == "purchase")
    views = events.filter(F.col("event_type") == "view")
    got = interval_join(
        purchases, views, key="user_id", left_ts="ts", right_ts="ts", max_lag="1 hour"
    )
    view_ids = sorted(r.r_event_id for r in got.collect())
    assert view_ids == [10, 12]


def test_interval_join_requires_same_user(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    events = spark.createDataFrame(
        [
            (1, 7, t0, "purchase"),
            (2, 8, t0, "view"),  # other user, same instant
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    got = interval_join(
        events.filter(F.col("event_type") == "purchase"),
        events.filter(F.col("event_type") == "view"),
        key="user_id",
        left_ts="ts",
        right_ts="ts",
    )
    assert got.count() == 0


def test_ewma_matches_hand_computation(spark):
    import datetime as dt

    from stock_bars_data_engineering_project_spark.operators.ema import ewma_per_key

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, 1, t0 + dt.timedelta(hours=i), v)
        for i, v in enumerate([10.0, 20.0, 30.0, 40.0])
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        r.event_id: r.ema
        for r in ewma_per_key(df, alpha=0.5).collect()
    }
    # y1=10, y2=.5*10+.5*20=15, y3=.5*15+.5*30=22.5, y4=.5*22.5+.5*40=31.25
    assert got == {0: 10.0, 1: 15.0, 2: 22.5, 3: 31.25}


def test_ewma_supports_string_keys(spark):
    import datetime as dt

    from stock_bars_data_engineering_project_spark.operators.ema import ewma_per_key

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("AAPL", 1, t0, 10.0), ("AAPL", 2, t0 + dt.timedelta(hours=1), 20.0)],
        "symbol string, seq int, ts timestamp, value double",
    )
    got = ewma_per_key(
        df, key="symbol", ts="ts", value="value", tiebreak="seq", alpha=0.5
    ).collect()
    assert {r.symbol for r in got} == {"AAPL"}
    assert sorted(r.ema for r in got) == [10.0, 15.0]
