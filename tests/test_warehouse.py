"""Sink-layer semantics, mirroring the reference's connector tests
(/root/reference/etl_project_tests/connectors/test_postgresql.py:71-168)
retargeted at the versioned parquet warehouse: insert lands rows,
overwrite replaces, upsert updates-in-place + inserts new keys, and —
beyond the reference — merge idempotency (Q6/Q9) and snapshot isolation.
"""

from __future__ import annotations

import pytest

from stock_bars_data_engineering_project_spark.sinks import (
    ParquetWarehouse,
    get_checkpoint,
    save_checkpoint,
)

SCHEMA = "stock string, timestamp string, close double"


@pytest.fixture()
def wh(spark, tmp_path):
    return ParquetWarehouse(spark, str(tmp_path / "wh"))


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_insert_lands_rows(spark, wh):
    wh.append(_df(spark, [("TSLA", "2025-10-01T10:00:00Z", 252.0)]), "t")
    wh.append(_df(spark, [("AAPL", "2025-10-01T10:00:00Z", 171.0)]), "t")
    got = {r.stock for r in wh.read("t").collect()}
    assert got == {"TSLA", "AAPL"}


def test_overwrite_replaces(spark, wh):
    wh.append(_df(spark, [("TSLA", "a", 1.0), ("AAPL", "a", 2.0)]), "t")
    wh.overwrite(_df(spark, [("GOOG", "b", 3.0)]), "t")
    rows = wh.read("t").collect()
    assert len(rows) == 1 and rows[0].stock == "GOOG"


def test_upsert_updates_and_inserts(spark, wh):
    # reference test_upsert: TSLA close 252 -> 260 updated, MSFT inserted
    wh.merge(_df(spark, [("TSLA", "x", 252.0)]), "t", keys=("stock", "timestamp"))
    wh.merge(
        _df(spark, [("TSLA", "x", 260.0), ("MSFT", "x", 310.0)]),
        "t",
        keys=("stock", "timestamp"),
    )
    rows = {r.stock: r.close for r in wh.read("t").collect()}
    assert rows == {"TSLA": 260.0, "MSFT": 310.0}


def test_upsert_idempotent_q9(spark, wh):
    batch = _df(spark, [("TSLA", "x", 260.0), ("MSFT", "x", 310.0)])
    wh.merge(batch, "t", keys=("stock", "timestamp"))
    before = sorted(map(tuple, wh.read("t").collect()))
    wh.merge(batch, "t", keys=("stock", "timestamp"))  # replay the overlap
    after = sorted(map(tuple, wh.read("t").collect()))
    assert before == after


def test_upsert_dedupes_source_batch_q6(spark, wh):
    dup = _df(spark, [("TSLA", "x", 1.0), ("TSLA", "x", 1.0)])
    wh.merge(dup, "t", keys=("stock", "timestamp"))
    assert wh.read("t").count() == 1


def test_partition_pruned_merge(spark, wh):
    base = _df(
        spark,
        [("TSLA", "d1", 1.0), ("AAPL", "d1", 2.0), ("TSLA", "d2", 3.0)],
    )
    wh.merge(base, "t", keys=("stock", "timestamp"), partition_by=("timestamp",))
    # batch touches only partition d2
    wh.merge(
        _df(spark, [("TSLA", "d2", 9.0), ("MSFT", "d2", 5.0)]),
        "t",
        keys=("stock", "timestamp"),
        partition_by=("timestamp",),
    )
    rows = {(r.stock, r.timestamp): r.close for r in wh.read("t").collect()}
    assert rows == {
        ("TSLA", "d1"): 1.0,
        ("AAPL", "d1"): 2.0,
        ("TSLA", "d2"): 9.0,
        ("MSFT", "d2"): 5.0,
    }


def test_snapshot_isolation(spark, wh):
    wh.overwrite(_df(spark, [("A", "x", 1.0)]), "t")
    old = wh.read("t")  # plan bound to snapshot v1
    wh.overwrite(_df(spark, [("B", "y", 2.0)]), "t")
    assert [r.stock for r in old.collect()] == ["A"]  # unaffected by v2
    assert [r.stock for r in wh.read("t").collect()] == ["B"]


def test_catalog_probe_and_reflection(spark, wh):
    assert not wh.exists("t")
    wh.append(_df(spark, [("A", "x", 1.0)]), "t")
    assert wh.exists("t")
    assert [f.name for f in wh.schema("t")] == ["stock", "timestamp", "close"]


def test_checkpoint_roundtrip(spark, wh):
    assert get_checkpoint(wh, "stock_bars") is None
    save_checkpoint(wh, "stock_bars", "2025-09-30T04:00:00Z")
    save_checkpoint(wh, "other", "2025-01-01T00:00:00Z")
    save_checkpoint(wh, "stock_bars", "2025-10-07T04:00:00Z")  # upsert wins
    assert get_checkpoint(wh, "stock_bars") == "2025-10-07T04:00:00Z"
    assert get_checkpoint(wh, "other") == "2025-01-01T00:00:00Z"


def test_log_appends(spark, wh):
    wh.log("meta", "run one")
    wh.log("meta", "run two")
    msgs = [r.log_message for r in wh.read("meta").collect()]
    assert sorted(msgs) == ["run one", "run two"]


def test_merge_key_moving_partitions_does_not_duplicate(spark, wh):
    """A key whose partition value changes between batches must end up
    with exactly ONE row (source wins): the partition-pruned rewrite is
    only sound when partition columns are part of the merge key, so this
    shape must take the full-table merge path."""
    wh.merge(
        _df(spark, [("TSLA", "d1", 1.0)]),
        "t",
        keys=("stock",),
        partition_by=("timestamp",),
    )
    wh.merge(
        _df(spark, [("TSLA", "d2", 9.0)]),
        "t",
        keys=("stock",),
        partition_by=("timestamp",),
    )
    rows = [(r.stock, r.timestamp, r.close) for r in wh.read("t").collect()]
    assert rows == [("TSLA", "d2", 9.0)]
