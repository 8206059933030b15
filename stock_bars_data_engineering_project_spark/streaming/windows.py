"""Event-time windowed aggregation — batch and Structured Streaming.

The reference has no streaming, but its checkpoint/upsert loop (SURVEY
§2.8) is hand-rolled micro-batching; this module supplies the formal
versions: tumbling / sliding / session windows over event time, usable
identically on a batch DataFrame or a ``readStream`` source (the
DataFrame code is THE SAME — that is the point of Structured Streaming).

Scale: windowed aggs shuffle on (window, keys); watermarks bound state.
Session windows use ``F.session_window`` (native state merge) rather
than a gaps-and-islands window function, so streaming and batch agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import as_event_time, round_half_up


def tumbling_agg(
    df: DataFrame,
    ts: str = "ts",
    duration: str = "1 day",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Fixed epoch-aligned windows: count + sum per (window, keys)."""
    return (
        df.groupBy(F.window(ts, duration).alias("win"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round_half_up(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(
    df: DataFrame,
    ts: str = "ts",
    duration: str = "2 hours",
    slide: str = "1 hour",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Overlapping windows — each event lands in duration/slide windows."""
    return (
        df.groupBy(F.window(ts, duration, slide).alias("win"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round_half_up(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"), *keys, "n_events", "sum_value"
        )
    )


def session_agg(
    df: DataFrame,
    ts: str = "ts",
    gap: str = "2 hours",
    key: str = "user_id",
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge into one
    session per key. Native ``session_window`` — the same operator
    Structured Streaming uses for stateful session merge."""
    return (
        df.groupBy(F.session_window(ts, gap).alias("win"), key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round_half_up(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col(key),
            F.col("win.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def stream_events(
    spark: SparkSession,
    src_dir: str,
    schema,
    watermark: str = "1 hour",
    ts: str = "ts",
) -> DataFrame:
    """``readStream`` over a parquet directory with an event-time
    watermark — late data beyond ``watermark`` is dropped and state for
    closed windows is reclaimed (the streaming analog of the reference's
    overlap-inclusive re-read, SURVEY C4). ``withWatermark`` requires
    TIMESTAMP proper, so a TIMESTAMP_NTZ event-time column is first
    reinterpreted as a UTC instant (:func:`as_event_time`)."""
    stream = spark.readStream.schema(schema).parquet(src_dir)
    return as_event_time(stream, ts).withWatermark(ts, watermark)


def run_stream_to_memory(
    agg: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Drive a streaming aggregation to completion against the available
    input (availableNow) into an in-memory table for inspection/tests."""
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
