"""Env-gated JDBC PostgreSQL connector (sinks/jdbc.py): mirrors the
reference's connector test semantics
(etl_project_tests/connectors/test_postgresql.py:76-168) — insert,
drop-and-replace overwrite, and keyed upsert (updated row + new row) —
against a live database when SPARK_GRAFT_JDBC_URL is set; cleanly
skipped otherwise. The unconfigured-construction guard and the upsert
statement shape run everywhere (no database needed)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from stock_bars_data_engineering_project_spark.sinks.jdbc import (
    ENV_URL,
    JdbcWarehouse,
    jdbc_configured,
)

live = pytest.mark.skipif(
    not jdbc_configured(),
    reason=f"{ENV_URL} not set — JDBC connector is env-gated",
)


def test_from_env_unconfigured_raises(spark, monkeypatch):
    monkeypatch.delenv(ENV_URL, raising=False)
    with pytest.raises(RuntimeError, match=ENV_URL):
        JdbcWarehouse.from_env(spark)


def test_upsert_guards_without_database(spark):
    """Key validation fires before any connection is attempted."""
    wh = JdbcWarehouse(spark, "jdbc:postgresql://nowhere:5432/nodb")
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    with pytest.raises(ValueError, match="at least one key"):
        wh.upsert(df, "t", keys=())
    with pytest.raises(ValueError, match="absent from frame"):
        wh.upsert(df, "t", keys=("nope",))


def _bars(spark, rows):
    return spark.createDataFrame(
        rows, "stock string, company string, close double, volume long"
    )


@live
def test_insert(spark):
    wh = JdbcWarehouse.from_env(spark)
    wh.drop_table("sg_jdbc_ins")
    wh.insert(
        _bars(spark, [("TSLA", "Tesla Inc", 252.0, 1_000_000),
                      ("AAPL", "Apple Inc", 171.0, 800_000)]),
        "sg_jdbc_ins",
    )
    got = {r.stock for r in wh.read("sg_jdbc_ins").collect()}
    assert got == {"TSLA", "AAPL"}
    wh.drop_table("sg_jdbc_ins")


@live
def test_overwrite(spark):
    wh = JdbcWarehouse.from_env(spark)
    wh.drop_table("sg_jdbc_ovw")
    wh.insert(_bars(spark, [("TSLA", "Tesla Inc", 252.0, 1)]), "sg_jdbc_ovw")
    wh.overwrite(
        _bars(spark, [("GOOG", "Alphabet Inc", 2810.0, 600_000)]),
        "sg_jdbc_ovw",
    )
    rows = wh.read("sg_jdbc_ovw").collect()
    assert len(rows) == 1 and rows[0].stock == "GOOG"
    wh.drop_table("sg_jdbc_ovw")


@live
def test_upsert_updates_and_inserts(spark):
    """The reference's upsert law: re-sent key updates non-key columns
    to the excluded row's values; unseen key inserts."""
    wh = JdbcWarehouse.from_env(spark)
    wh.drop_table("sg_jdbc_ups")
    wh.execute(
        "CREATE TABLE sg_jdbc_ups (stock TEXT PRIMARY KEY, company TEXT, "
        "close DOUBLE PRECISION, volume BIGINT)"
    )
    wh.upsert(
        _bars(spark, [("TSLA", "Tesla Inc", 252.0, 1_000_000)]),
        "sg_jdbc_ups", keys=("stock",),
    )
    wh.upsert(
        _bars(spark, [("TSLA", "Tesla Inc", 260.0, 1_000_000),
                      ("MSFT", "Microsoft Corp", 302.0, 700_000)]),
        "sg_jdbc_ups", keys=("stock",),
    )
    got = {r.stock: r for r in wh.read("sg_jdbc_ups").collect()}
    assert set(got) == {"TSLA", "MSFT"}
    assert got["TSLA"].close == 260.0
    assert got["MSFT"].company == "Microsoft Corp"
    # idempotent replay: the same batch changes nothing
    wh.upsert(
        _bars(spark, [("TSLA", "Tesla Inc", 260.0, 1_000_000)]),
        "sg_jdbc_ups", keys=("stock",),
    )
    assert wh.read("sg_jdbc_ups").count() == 2
    wh.drop_table("sg_jdbc_ups")


@live
def test_partitioned_read_roundtrip(spark):
    """A partition-spec read returns the same rows as the plain read —
    the parallel-cursor path is a pure transport change."""
    wh = JdbcWarehouse.from_env(spark)
    wh.drop_table("sg_jdbc_part")
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    wh.insert(df, "sg_jdbc_part")
    plain = sorted(tuple(r) for r in wh.read("sg_jdbc_part").collect())
    ranged = sorted(
        tuple(r)
        for r in wh.read(
            "sg_jdbc_part", partition_col="id", lower=0, upper=1000,
            num_partitions=4,
        ).collect()
    )
    assert plain == ranged and len(plain) == 1000
    wh.drop_table("sg_jdbc_part")
