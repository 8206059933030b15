"""Typed schema-on-read JSON extraction (the s2_explode_tokens
'json_props' arm's shape): parsed values are real INTs, malformed or
missing payloads degrade to NULL instead of failing the job."""

from __future__ import annotations

from pyspark.sql import functions as F


def _extract(spark, rows):
    df = spark.createDataFrame(rows, "event_id long, props string")
    return {
        r.event_id: r.k
        for r in df.select(
            "event_id", F.from_json("props", "k INT")["k"].alias("k")
        ).collect()
    }


def test_typed_parse_and_arithmetic(spark):
    got = _extract(spark, [(1, '{"k": 69}'), (2, '{"k": -3}')])
    assert got == {1: 69, 2: -3}
    df = spark.createDataFrame([(1, '{"k": 7}')], "event_id long, props string")
    doubled = df.select(
        (F.from_json("props", "k INT")["k"] * 2 + 1).alias("v")
    ).first()
    assert doubled.v == 15  # integer math on the PARSED value


def test_malformed_and_missing_degrade_to_null(spark):
    got = _extract(
        spark,
        [
            (1, "not json"),
            (2, "{}"),
            (3, None),
            (4, '{"other": 1}'),
            (5, '{"k": "text"}'),
        ],
    )
    assert got == {1: None, 2: None, 3: None, 4: None, 5: None}
