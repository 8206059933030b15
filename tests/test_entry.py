"""Smoke the driver contract surface."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {
        "user_id",
        "event_date",
        "value",
        "prev_value",
        "return_pct",
        "moving_avg",
        "moving_stddev",
    }


def test_queries_have_oracles_or_are_flagged(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "registry must not be empty"
    assert set(oracles) <= set(qs)


def test_every_query_runs_at_smallest_sf(spark):
    for name, fn in entrymod.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.columns, name
        df.limit(1).collect()
