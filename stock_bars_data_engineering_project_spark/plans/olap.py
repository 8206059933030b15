"""OLAP-variety queries: grouping sets, rank-family windows, per-group
percentiles, outer-join reconciliation, UNION ALL.

The reference's aggregate surface is max + count (SURVEY §2.4) and its
window surface is lag/avg/stddev (§2.5); these queries complete the
standard OLAP menu so a warehouse user switching engines finds every
shape they run today. All are single-shuffle plans: grouping-set
expansion happens map-side before the exchange, the rank family shares
one sort, and the outer join shuffles both pre-aggregated (tiny) sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import round_half_up, sql_round
from ..sources.readers import load_table
from .registry import register


@register(
    "cube_order_counts",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS grouping_level,
       COUNT(*) AS n_orders,
       {sql_round('SUM(o_totalprice)', 2)} AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    tags=("agg", "cube"),
)
def cube_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions with GROUPING() disambiguation — all four
    grouping sets in one pass (map-side expansion, one exchange). The
    grouping_level column distinguishes a real NULL dimension value from
    a subtotal row, exactly as ANSI intends; complements rollup_pricing's
    hierarchy with the full lattice."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority"))
        .cast("int")
        .alias("grouping_level"),
        F.count(F.lit(1)).alias("n_orders"),
        round_half_up(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@register(
    "percentiles_by_segment",
    oracle=f"""
SELECT c.c_mktsegment,
       {sql_round('quantile_cont(o.o_totalprice, 0.25)', 4)} AS p25,
       {sql_round('quantile_cont(o.o_totalprice, 0.5)', 4)} AS p50,
       {sql_round('quantile_cont(o.o_totalprice, 0.9)', 4)} AS p90,
       {sql_round('MAX(o.o_totalprice)', 2)} AS max_price
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment
""",
    tags=("agg", "stats"),
)
def percentiles_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated per-group percentiles of order value by market
    segment (Spark `percentile` ≡ DuckDB `quantile_cont`, both linear
    interpolation). Exact is the correctness baseline; the 100 TB path
    swaps `approx_percentile` (t-digest sketch, mergeable map-side) —
    the error of that swap is bounded in tests/test_stats.py."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            round_half_up(F.expr("percentile(o_totalprice, 0.25D)"), 4).alias("p25"),
            round_half_up(F.expr("percentile(o_totalprice, 0.5D)"), 4).alias("p50"),
            round_half_up(F.expr("percentile(o_totalprice, 0.9D)"), 4).alias("p90"),
            round_half_up(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


@register(
    "window_rank_family",
    oracle="""
SELECT user_id, event_id, value,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drank,
       CAST(NTILE(4) OVER w AS INT) AS quartile,
       CAST(FLOOR(CUME_DIST() OVER w * 10000) AS BIGINT) AS cume_bps
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
""",
    tags=("window", "rank"),
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank-family windows the reference lacks — dense_rank, ntile,
    cume_dist — all over ONE partition/order spec so Catalyst plans a
    single exchange + sort for the three functions. Ordering made
    tie-free with the event_id tiebreak (cross-engine determinism);
    cume_dist scaled to integer basis points to avoid double-hash
    divergence."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.dense_rank().over(w).cast("bigint").alias("drank"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        # FLOOR on both sides: Spark's double->bigint cast truncates while
        # DuckDB's rounds, so the truncation is made explicit
        F.floor(F.cume_dist().over(w) * 10000).cast("bigint").alias("cume_bps"),
    )


@register(
    "resample_ohlc_daily",
    oracle=f"""
SELECT user_id,
       CAST(ts AS DATE) AS day,
       {sql_round('arg_min(value, ts)', 4)} AS open_v,
       {sql_round('MAX(value)', 4)} AS high_v,
       {sql_round('MIN(value)', 4)} AS low_v,
       {sql_round('arg_max(value, ts)', 4)} AS close_v,
       COUNT(*) AS n_ticks
FROM events
GROUP BY user_id, CAST(ts AS DATE)
""",
    tags=("agg", "resample", "ohlc"),
)
def resample_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tick-to-bar resampling — the inverse of the reference's pipeline
    (which CONSUMES daily bars): raw events collapse to per-key daily
    OHLC candles in ONE aggregate pass via min_by/max_by (no window, no
    sort — partial-aggregable, so 100 TB of ticks reduce map-side).
    Spark side keys min_by on (ts, event_id) for tie-robustness; the
    oracle's plain arg_min(ts) agrees because (user_id, ts) is unique
    in this data."""
    ev = load_table(spark, sf_dir, "events")
    tie = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        round_half_up(F.min_by("value", tie), 4).alias("open_v"),
        round_half_up(F.max("value"), 4).alias("high_v"),
        round_half_up(F.min("value"), 4).alias("low_v"),
        round_half_up(F.max_by("value", tie), 4).alias("close_v"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


@register(
    "full_outer_year_reconcile",
    oracle="""
WITH y99 AS (
    SELECT o_custkey, COUNT(*) AS n99 FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY o_custkey
), y00 AS (
    SELECT o_custkey, COUNT(*) AS n00 FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '2001-01-01 00:00:00'
    GROUP BY o_custkey
)
SELECT COALESCE(y99.o_custkey, y00.o_custkey) AS custkey,
       COALESCE(y99.n99, 0) AS n99,
       COALESCE(y00.n00, 0) AS n00,
       COALESCE(y00.n00, 0) - COALESCE(y99.n99, 0) AS delta
FROM y99 FULL OUTER JOIN y00 ON y99.o_custkey = y00.o_custkey
""",
    tags=("join", "outer"),
)
def full_outer_year_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer reconciliation: per-customer order counts across two
    years, keeping customers present in either (the audit/diff shape).
    Both sides pre-aggregate BEFORE the outer join, so the join input is
    one row per customer-year, not raw orders — at 100 TB the outer join
    shuffles keys, not facts."""
    o = load_table(spark, sf_dir, "orders")

    def year_counts(y: int, key: str, alias: str) -> DataFrame:
        # distinct key names per side: both frames descend from the same
        # scan, so qualified access would be ambiguous after the join
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01 00:00:00").cast("timestamp"))
            )
            .groupBy(F.col("o_custkey").alias(key))
            .agg(F.count(F.lit(1)).alias(alias))
        )

    y99 = year_counts(1999, "ck99", "n99")
    y00 = year_counts(2000, "ck00", "n00")
    return (
        y99.join(y00, F.col("ck99") == F.col("ck00"), "full_outer")
        .select(
            F.coalesce(F.col("ck99"), F.col("ck00")).alias("custkey"),
            F.coalesce(F.col("n99"), F.lit(0)).alias("n99"),
            F.coalesce(F.col("n00"), F.lit(0)).alias("n00"),
            (F.coalesce(F.col("n00"), F.lit(0)) - F.coalesce(F.col("n99"), F.lit(0))).alias(
                "delta"
            ),
        )
    )


@register(
    "window_range_2day",
    oracle=f"""
SELECT user_id, ts, value,
       {sql_round('''SUM(value) OVER (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL '2 days' PRECEDING AND CURRENT ROW)''', 2)}
           AS sum_2d,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL '2 days' PRECEDING AND CURRENT ROW)
           AS n_2d
FROM events
""",
    tags=("window", "range"),
)
def window_range_2day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame — every row aggregates the trailing 2 days
    of ITS OWN key, however many rows that is (the frame the reference's
    ROWS-4 window approximates only because its bars are exactly daily).
    Spark expresses interval ranges as rangeBetween over epoch MICROS —
    integer-exact, matching the oracle's microsecond timestamp
    arithmetic (epoch seconds would truncate sub-second components and
    shift frame boundaries); ordering by a monotone transform of ts
    keeps one shuffle + one sort for both window functions."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-2 * 86400 * 1_000_000, 0)
    )
    return ev.select(
        "user_id",
        "ts",
        "value",
        round_half_up(F.sum("value").over(w), 2).alias("sum_2d"),
        F.count(F.lit(1)).over(w).alias("n_2d"),
    )


@register(
    "window_day_anchors",
    oracle=f"""
SELECT user_id, ts, value,
       {sql_round('FIRST_VALUE(value) OVER w', 4)} AS day_open,
       {sql_round('LAST_VALUE(value) OVER w', 4)} AS running_last,
       {sql_round('NTH_VALUE(value, 2) OVER w', 4)} AS second_tick
FROM events
WINDOW w AS (PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    tags=("window", "anchors"),
)
def window_day_anchors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value anchors within a (key, day) partition — the
    intraday 'open so far / latest / second tick' markers. The explicit
    growing ROWS frame makes last_value mean 'running last' identically
    in both engines (the ANSI default frame would too, but implicitly);
    tie-free ordering via event_id."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id", F.to_date("ts"))
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "ts",
        "value",
        round_half_up(F.first("value").over(w), 4).alias("day_open"),
        round_half_up(F.last("value").over(w), 4).alias("running_last"),
        round_half_up(F.nth_value("value", 2).over(w), 4).alias("second_tick"),
    )


@register(
    "pivot_status_by_segment",
    oracle=f"""
SELECT c.c_mktsegment,
       COUNT(CASE WHEN o.o_orderstatus = 'O' THEN 1 END) AS n_open,
       COUNT(CASE WHEN o.o_orderstatus = 'F' THEN 1 END) AS n_filled,
       COUNT(CASE WHEN o.o_orderstatus = 'P' THEN 1 END) AS n_pending,
       {sql_round("SUM(CASE WHEN o.o_orderstatus = 'O' THEN o.o_totalprice ELSE 0 END)", 2)} AS open_value
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment
""",
    tags=("agg", "pivot"),
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide reshape: order status pivoted into columns per market
    segment. Uses an EXPLICIT pivot value list — without it Spark runs
    an extra distinct pass over 100 TB just to discover the columns, and
    the output schema becomes data-dependent (a deploy hazard). The
    conditional-aggregation form is the same single-shuffle plan the
    oracle spells out."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey)
    pivoted = (
        joined.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))).alias("val"),
        )
    )
    # coalesce to 0: a (segment, status) combination with no rows pivots
    # to NULL, but the conditional-aggregate semantics (and the oracle)
    # define it as zero
    return pivoted.select(
        "c_mktsegment",
        F.coalesce(F.col("O_n"), F.lit(0)).alias("n_open"),
        F.coalesce(F.col("F_n"), F.lit(0)).alias("n_filled"),
        F.coalesce(F.col("P_n"), F.lit(0)).alias("n_pending"),
        round_half_up(F.coalesce(F.col("O_val"), F.lit(0.0)), 2).alias("open_value"),
    )


@register(
    "corr_to_market",
    oracle=f"""
WITH daily AS (
    SELECT user_id, CAST(ts AS DATE) AS day, AVG(value) AS user_avg
    FROM events GROUP BY user_id, CAST(ts AS DATE)
), market AS (
    SELECT CAST(ts AS DATE) AS day, AVG(value) AS mkt_avg
    FROM events GROUP BY CAST(ts AS DATE)
)
SELECT d.user_id,
       COUNT(*) AS n_days,
       {sql_round('corr(d.user_avg, m.mkt_avg)', 3)} AS market_corr
FROM daily d JOIN market m ON d.day = m.day
GROUP BY d.user_id
HAVING COUNT(*) >= 5
""",
    tags=("agg", "stats", "corr"),
)
def corr_to_market(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key correlation to the market aggregate (the beta/correlation
    screen a bars engine runs across every symbol): two partial
    aggregates, a broadcast-sized join on day, then `corr` — itself
    partial-aggregable, so the whole plan is three map-side-reduced
    shuffles of key-sized data, never raw ticks. Rounded to 3 places:
    corr's running-moment accumulation order differs across engines in
    the last few ulps."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("user_avg")
    )
    market = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("mkt_avg")
    )
    return (
        daily.join(F.broadcast(market), "day")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            round_half_up(F.corr("user_avg", "mkt_avg"), 3).alias("market_corr"),
        )
        .filter(F.col("n_days") >= 5)
    )


@register(
    "unpivot_lineitem_measures",
    oracle=f"""
SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
       {sql_round('l_quantity', 4)} AS val
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'price' AS metric,
       {sql_round('l_extendedprice', 4)} AS val
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount' AS metric,
       {sql_round('l_discount', 4)} AS val
FROM lineitem
""",
    tags=("reshape", "unpivot"),
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape (the inverse of pivot_status_by_segment):
    three measure columns melt into (metric, val) rows via the native
    unpivot/melt operator — one Expand pass over the scan, never three
    scans (which is what the portable UNION ALL oracle spells out)."""
    li = load_table(spark, sf_dir, "lineitem")
    melted = li.melt(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="metric",
        valueColumnName="raw",
    )
    return melted.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("metric") == "l_quantity", "quantity")
        .when(F.col("metric") == "l_extendedprice", "price")
        .otherwise("discount")
        .alias("metric"),
        round_half_up(F.col("raw"), 4).alias("val"),
    )


@register(
    "grouping_sets_explicit",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       {sql_round('SUM(o_totalprice)', 2)} AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
""",
    tags=("agg", "groupingsets"),
)
def grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — two independent single-dimension
    aggregates in ONE scan+shuffle (map-side Expand), the grouping-set
    form that is neither a rollup prefix chain nor the full cube
    lattice. Executed via Spark SQL text — the same Catalyst path the
    DataFrame cube/rollup APIs lower to."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               {{r}} AS sum_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """.replace(
            "{r}",
            "CAST(ROUND(CAST(SUM(o_totalprice) AS DECIMAL(30,10)), 2) AS DOUBLE)",
        )
    )


@register(
    "value_histogram",
    oracle=f"""
SELECT CAST(FLOOR(value / 10.0) AS BIGINT) AS bucket,
       COUNT(*) AS n,
       {sql_round('100.0 * COUNT(*) / (SELECT COUNT(*) FROM events)', 4)} AS pct
FROM events
GROUP BY 1
""",
    tags=("agg", "histogram"),
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width distribution histogram with percentage-of-total —
    one partial-aggregable pass plus a broadcast scalar for the
    denominator (never a second full scan)."""
    ev = load_table(spark, sf_dir, "events")
    total = ev.agg(F.count(F.lit(1)).alias("total"))
    return (
        ev.groupBy(F.floor(F.col("value") / 10.0).cast("bigint").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            "n",
            round_half_up(100.0 * F.col("n") / F.col("total"), 4).alias("pct"),
        )
    )


@register(
    "union_all_tagged_events",
    oracle="""
SELECT 'high' AS band, event_id, user_id, value FROM events WHERE value >= 90
UNION ALL
SELECT 'error' AS band, event_id, user_id, value FROM events WHERE event_type = 'error'
""",
    tags=("setop",),
)
def union_all_tagged_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL with a provenance tag — bag semantics (a row matching
    both arms appears twice), the standard multi-source concatenation.
    Plans as a no-shuffle Union of two pushed-down scans."""
    ev = load_table(spark, sf_dir, "events")
    high = ev.filter(F.col("value") >= 90).select(
        F.lit("high").alias("band"), "event_id", "user_id", "value"
    )
    err = ev.filter(F.col("event_type") == "error").select(
        F.lit("error").alias("band"), "event_id", "user_id", "value"
    )
    return high.unionByName(err)
