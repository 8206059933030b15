"""Event-time window queries + incremental-merge semantics, oracle-paired.

``win_*`` run the streaming window operators in batch mode (same code
path Structured Streaming executes). ``stream_tumbling_hourly`` runs a
REAL ``readStream`` query (availableNow trigger, memory sink) and
returns its result table — proving the streaming pipeline end-to-end
while still hash-matching the batch oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import sql_round
from ..operators.merge import upsert_frames
from ..sources.readers import load_table
from ..streaming.stateful import first_seen_per_key
from ..streaming.windows import (
    run_stream_to_memory,
    session_agg,
    sliding_agg,
    stream_events,
    tumbling_agg,
)
from .registry import register


def _stage_events_dir(sf_dir: str, batch) -> str:
    """Stage the filtered events as a parquet dir for readStream, keyed
    by sf_dir. Re-stages when the SOURCE parquet is newer than the
    staged copy — a stable cache name must not serve stale rows after
    testdata regeneration."""
    import os

    src = os.path.join("/tmp", "stream_src_" + sf_dir.strip("/").replace("/", "_"))
    source_file = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(src):
        try:
            fresh = os.path.getmtime(src) >= os.path.getmtime(source_file)
        except OSError:
            fresh = False
        if fresh:
            return src
    batch.write.mode("overwrite").parquet(src)
    return src


@register(
    "win_tumbling_daily",
    oracle=f"""
SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_round('SUM(value)', 2)} AS sum_value
FROM events
GROUP BY 1, 2
""",
    tags=("streaming", "window"),
)
def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day event-time windows (epoch-aligned) — identical code
    runs under readStream with a watermark."""
    return tumbling_agg(load_table(spark, sf_dir, "events"), duration="1 day")


@register(
    "win_sliding_2h",
    oracle="""
WITH expanded AS (
    SELECT unnest([time_bucket(INTERVAL '1 hour', ts),
                   time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour']) AS window_start,
           event_type
    FROM events
)
SELECT window_start, event_type, COUNT(*) AS n_events
FROM expanded
GROUP BY 1, 2
""",
    tags=("streaming", "window"),
)
def q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h/1h windows — each event contributes to two buckets; the
    oracle expands the membership explicitly."""
    return sliding_agg(
        load_table(spark, sf_dir, "events"), duration="2 hours", slide="1 hour"
    )


@register(
    "win_session_2h",
    oracle=f"""
WITH flagged AS (
    SELECT user_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 7200000
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
    SELECT user_id, ts, value,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       COUNT(*) AS n_events,
       {sql_round('SUM(value)', 2)} AS sum_value
FROM numbered
GROUP BY user_id, session_id
""",
    tags=("streaming", "window", "session"),
)
def q_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (2h inactivity gap) via native ``session_window``
    — checked against a gaps-and-islands oracle, proving the stateful
    merge semantics equal the classic SQL formulation."""
    return session_agg(load_table(spark, sf_dir, "events"), gap="2 hours")


@register(
    "incremental_merge_upsert",
    oracle="""
WITH source AS (
    SELECT event_id, user_id, ts, event_type, value + 1000 AS value
    FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
), target AS (
    SELECT event_id, user_id, ts, event_type, value
    FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
)
SELECT event_id, user_id, ts, event_type, value FROM source
UNION ALL
SELECT t.event_id, t.user_id, t.ts, t.event_type, t.value
FROM target t LEFT JOIN source s ON t.event_id = s.event_id
WHERE s.event_id IS NULL
""",
    tags=("incremental", "merge"),
)
def q_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3/C4 as a query: an overlapping re-extract (ts >= 01-15, values
    revised) merged into the existing target (ts < 01-20) — source wins
    on key collision, non-overlapping target rows survive. The exact Q9
    healing semantics of the reference's incremental upsert."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    cut_lo = F.lit("2024-01-15 00:00:00").cast("timestamp")
    cut_hi = F.lit("2024-01-20 00:00:00").cast("timestamp")
    target = events.filter(F.col("ts") < cut_hi)
    source = events.filter(F.col("ts") >= cut_lo).withColumn(
        "value", F.col("value") + 1000
    )
    return upsert_frames(target, source, keys=("event_id",))


@register(
    "stream_stateful_dedup",
    oracle="""
SELECT user_id, ts AS first_ts, event_id AS first_event_id, value AS first_value
FROM (
    SELECT user_id, ts, event_id, value,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
) WHERE rn = 1
""",
    tags=("streaming", "stateful"),
)
def q_stream_stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    keyed first-seen dedup — one output row per user ever, state
    persisted in the state store. Drained with availableNow into a
    memory sink; the oracle is the batch gaps-free formulation
    (row_number = 1 per key by event time)."""
    batch = load_table(spark, sf_dir, "events").filter(
        F.col("ts") >= F.lit("2024-01-25 00:00:00").cast("timestamp")
    )
    schema = batch.schema
    src = _stage_events_dir(sf_dir, batch)
    events = spark.readStream.schema(batch.schema).parquet(src)
    out = first_seen_per_key(events, key="user_id")
    run_stream_to_memory(out, "stream_stateful_dedup", output_mode="append")
    return spark.table("stream_stateful_dedup")


@register(
    "stream_tumbling_hourly",
    oracle=f"""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_round('SUM(value)', 2)} AS sum_value
FROM events
WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
GROUP BY 1, 2
""",
    tags=("streaming",),
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Structured Streaming query: readStream(parquet) ->
    watermark -> tumbling window agg -> availableNow drain into a memory
    sink; the returned table hash-matches the batch oracle (complete
    output mode => watermark drops nothing on a finite drain)."""
    batch = load_table(spark, sf_dir, "events").filter(
        F.col("ts") >= F.lit("2024-01-25 00:00:00").cast("timestamp")
    )
    schema = batch.schema
    src = _stage_events_dir(sf_dir, batch)
    events = stream_events(spark, src, schema, watermark="1 hour")
    agg = (
        events.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value_raw"),
        )
    )
    run_stream_to_memory(agg, "stream_tumbling_hourly", output_mode="complete")
    out = spark.table("stream_tumbling_hourly")
    return out.select(
        F.col("win.start").alias("window_start"),
        "event_type",
        "n_events",
        F.round(F.col("sum_value_raw").cast("decimal(30,10)"), 2)
        .cast("double")
        .alias("sum_value"),
    )


@register(
    "stream_interval_join",
    oracle="""
SELECT p.event_id AS purchase_id,
       p.user_id AS user_id,
       v.event_id AS view_id
FROM events p
JOIN events v
  ON p.user_id = v.user_id
 AND v.ts >= p.ts - INTERVAL '1 hour'
 AND v.ts <= p.ts
WHERE p.event_type = 'purchase' AND v.event_type = 'view'
  AND p.ts >= TIMESTAMP '2024-01-25 00:00:00'
  AND v.ts >= TIMESTAMP '2024-01-25 00:00:00'
""",
    tags=("streaming", "join"),
)
def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join: purchases matched to the
    same user's views in the preceding hour — two readStream sources,
    watermark + event-time range predicate bounding both join states,
    append-mode drain. A finite availableNow drain emits exactly the
    batch interval join, which is what the oracle computes."""
    import os

    from ..streaming.joins import interval_join

    batch = load_table(spark, sf_dir, "events").filter(
        F.col("ts") >= F.lit("2024-01-25 00:00:00").cast("timestamp")
    )
    schema = batch.schema
    src = _stage_events_dir(sf_dir, batch)
    purchases = stream_events(spark, src, schema, watermark="1 hour").filter(
        F.col("event_type") == "purchase"
    )
    views = stream_events(spark, src, schema, watermark="1 hour").filter(
        F.col("event_type") == "view"
    )
    joined = interval_join(
        purchases, views, key="user_id", left_ts="ts", right_ts="ts", max_lag="1 hour"
    ).select(
        F.col("l_event_id").alias("purchase_id"),
        F.col("l_user_id").alias("user_id"),
        F.col("r_event_id").alias("view_id"),
    )
    run_stream_to_memory(joined, "stream_interval_join", output_mode="append")
    return spark.table("stream_interval_join")


@register(
    "stream_static_join",
    oracle=f"""
SELECT c.c_mktsegment,
       COUNT(*) AS n_events,
       {sql_round('SUM(e.value)', 2)} AS sum_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
WHERE e.ts >= TIMESTAMP '2024-01-25 00:00:00'
GROUP BY c.c_mktsegment
""",
    tags=("streaming", "join"),
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: a readStream event flow joined to a
    static dimension (customer) inside the streaming query — the
    standard per-batch broadcast enrichment (the static side needs no
    watermark or state), then a windowless grouped aggregate drained in
    complete mode. Oracle is the equivalent batch join+agg."""
    batch = load_table(spark, sf_dir, "events").filter(
        F.col("ts") >= F.lit("2024-01-25 00:00:00").cast("timestamp")
    )
    schema = batch.schema
    src = _stage_events_dir(sf_dir, batch)
    customers = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    events = spark.readStream.schema(schema).parquet(src)
    agg = (
        events.join(customers, events.user_id == customers.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value_raw"),
        )
    )
    run_stream_to_memory(agg, "stream_static_join", output_mode="complete")
    return spark.table("stream_static_join").select(
        "c_mktsegment",
        "n_events",
        F.round(F.col("sum_value_raw").cast("decimal(30,10)"), 2)
        .cast("double")
        .alias("sum_value"),
    )


@register(
    "stream_dedup_within_watermark",
    oracle="""
SELECT event_id, user_id, ts, event_type, value
FROM events
WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
""",
    tags=("streaming", "dedup"),
)
def q_stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in streaming dedup: the staged events are fed TWICE (two
    file copies — an at-least-once source) through
    ``dropDuplicatesWithinWatermark`` on the event key; the drain must
    emit every event exactly once, which is what the oracle (one clean
    copy) asserts. The watermark bounds the dedup state's lifetime —
    set generously here so no key expires mid-drain."""
    import os
    import shutil

    batch = load_table(spark, sf_dir, "events").filter(
        F.col("ts") >= F.lit("2024-01-25 00:00:00").cast("timestamp")
    )
    schema = batch.schema
    clean = _stage_events_dir(sf_dir, batch)
    dup_src = clean + "_dup2"
    if not os.path.isdir(dup_src) or (
        os.path.getmtime(dup_src) < os.path.getmtime(clean)
    ):
        shutil.rmtree(dup_src, ignore_errors=True)
        shutil.copytree(clean, dup_src)
        for name in os.listdir(clean):  # second copy of every data file
            if name.endswith(".parquet"):
                shutil.copy(
                    os.path.join(clean, name),
                    os.path.join(dup_src, "copy2_" + name),
                )
    events = (
        spark.readStream.schema(schema)
        .parquet(dup_src)
        .withWatermark("ts", "30 days")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    run_stream_to_memory(
        events, "stream_dedup_within_watermark", output_mode="append"
    )
    return spark.table("stream_dedup_within_watermark").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
