"""Multi-join analytical queries (TPC-H-shaped) over the driver testdata.

The reference's only join is a single broadcast dim equi-join
(assets.py:93-102, SURVEY §2.3 J1). A real warehouse workload chains
many joins; these queries widen the engine's join surface to the classic
shapes — multi-way star joins, aggregate-subquery semi-joins, anti-joins,
min-per-group join-backs, and set intersection — expressed declaratively
so Catalyst picks the physical strategy (broadcast for the tiny dims,
shuffle hash/sort-merge for fact-fact, AQE for runtime re-planning).

Scale notes baked into each query:
- `region`/`nation` are O(10^2) rows at any SF -> always `F.broadcast`.
- `customer`/`supplier`/`part` GROW with SF (10^7+ rows at 100 TB) -> NOT
  force-broadcast; Catalyst/AQE picks broadcast at small SF and
  shuffle-join at scale from runtime stats.
- Aggregations pre-reduce the fact side BEFORE joining wherever
  semantics allow (q18: having-filter on lineitem first; cheapest-
  supplier: groupBy before the part/supplier joins) — at 100 TB the
  pre-aggregation cuts the shuffled bytes by orders of magnitude.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import round_half_up, sql_round
from ..sources.readers import load_table
from .registry import register

def _revenue():
    # Built lazily: F.col needs an active SparkContext in classic mode,
    # and this module imports before any session exists.
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT l.l_orderkey,
       {sql_round("SUM(l.l_extendedprice * (1 - l.l_discount))", 2)} AS revenue,
       CAST(o.o_orderdate AS DATE) AS order_date,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '2000-01-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
""",
    tags=("join", "agg", "topk", "bench"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way fact⋈fact⋈dim join, filtered on all three
    inputs, grouped revenue, global top-10. Filters sit on each scan
    (pushed to parquet), the customer join pre-filters orders before the
    expensive lineitem join, and the final top-10 is a TakeOrdered (no
    global sort materialization). Deterministic tiebreak on l_orderkey
    so LIMIT picks identical rows in both engines."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(round_half_up(F.sum(_revenue()), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.to_date("o_orderdate").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_region_volume",
    oracle=f"""
SELECT n.n_name,
       {sql_round("SUM(l.l_extendedprice * (1 - l.l_discount))", 2)} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
GROUP BY n.n_name
""",
    tags=("join", "agg", "bench"),
)
def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join (two facts, four dims) with a
    local-supplier condition (customer and supplier share a nation).
    region⋈nation collapses to a broadcast before touching any fact;
    supplier/customer joins are left to Catalyst (broadcast at small SF,
    shuffle at 100 TB via AQE). The nation⋈region pre-join prunes
    suppliers to one region BEFORE the lineitem join."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-01-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            c,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(round_half_up(F.sum(_revenue()), 2).alias("revenue"))
    )


@register(
    "q18_large_orders",
    oracle=f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS DATE) AS order_date,
       {sql_round("o.o_totalprice", 2)} AS total_price,
       {sql_round("big.sum_qty", 2)} AS sum_qty
FROM (
    SELECT l_orderkey, SUM(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(l_quantity) > 300
) big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""",
    tags=("join", "agg", "having"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate-HAVING subquery joined back to its
    parents. The lineitem groupBy+filter runs FIRST (partial agg
    map-side, then the >300 filter keeps a few dozen keys), so the
    orders/customer joins see a tiny left side — at 100 TB this ordering
    is the difference between joining 10^11 rows and 10^4."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            round_half_up(F.col("o_totalprice"), 2).alias("total_price"),
            round_half_up(F.col("sum_qty"), 2).alias("sum_qty"),
        )
    )


@register(
    "anti_customers_no_urgent",
    oracle="""
SELECT c.c_custkey, c.c_name, c.c_mktsegment
FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
""",
    tags=("join", "anti"),
)
def anti_customers_no_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join: customers with no urgent order — NOT EXISTS as a
    LEFT ANTI hash join (one pass, no driver-side set). The orders side
    is filtered before the join so only urgent keys are shuffled/hashed."""
    c = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(
        urgent, c.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "semi_customers_recent_urgent",
    oracle="""
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderpriority = '1-URGENT'
      AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
)
""",
    tags=("join", "semi"),
)
def semi_customers_recent_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join: customers with a recent urgent order — EXISTS as a
    LEFT SEMI join; emits each matching customer once without
    materializing the match multiplicity (no post-join distinct)."""
    c = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp"))
    )
    return c.join(
        recent, c.c_custkey == recent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "cheapest_supplier_per_part",
    oracle=f"""
WITH cost AS (
    SELECT l_partkey, l_suppkey,
           MIN(l_extendedprice / l_quantity) AS unit_cost
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
)
SELECT p.p_partkey, p.p_name, s.s_name,
       {sql_round("c.unit_cost", 2)} AS unit_cost
FROM cost c
JOIN part p ON p.p_partkey = c.l_partkey AND p.p_size < 10
JOIN supplier s ON s.s_suppkey = c.l_suppkey
WHERE c.unit_cost = (
    SELECT MIN(c2.unit_cost) FROM cost c2 WHERE c2.l_partkey = c.l_partkey
)
""",
    tags=("join", "window", "subquery"),
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: min-per-group correlated subquery, decorrelated as
    a window-min + filter (one shuffle on l_partkey, no self-join). The
    per-(part,supplier) groupBy pre-reduces lineitem BEFORE the window
    and the part/supplier joins. Equality on unit_cost is safe across
    engines: both compute the identical IEEE division then select an
    exact element via MIN. Ties (two suppliers at min cost) emit both
    rows in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("min_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("min_cost")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    s = load_table(spark, sf_dir, "supplier")
    return (
        best.join(p, best.l_partkey == p.p_partkey)
        .join(s, best.l_suppkey == s.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            round_half_up(F.col("unit_cost"), 2).alias("unit_cost"),
        )
    )


@register(
    "intersect_purchase_view_users",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'view'
""",
    tags=("setop",),
)
def intersect_purchase_view_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (ANSI INTERSECT = distinct semantics): users who
    both purchased and viewed. Planned as a distinct + semi-join-style
    hash intersect — complements snapshot_diff_docs' EXCEPT to round out
    the set-operation surface."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    return purchases.intersect(views)


@register(
    "q10_returned_items",
    oracle=f"""
SELECT c.c_custkey, c.c_name,
       {sql_round("SUM(l.l_extendedprice * (1 - l.l_discount))", 2)} AS revenue,
       n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '2000-07-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    tags=("join", "agg", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue ranking of customers whose items
    came back — 4-way join with the returnflag filter pushed into the
    lineitem scan, grouped revenue, deterministic top-20. nation is
    broadcast; the l⋈o⋈c chain is left to Catalyst/AQE."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-07-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(round_half_up(F.sum(_revenue()), 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_share",
    oracle=f"""
SELECT {sql_round('''100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
           / SUM(l.l_extendedprice * (1 - l.l_discount))''', 4)} AS promo_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '2000-03-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '2000-04-01 00:00:00'
""",
    tags=("join", "agg"),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio (promo revenue share
    of one month) — single joined pass, both numerator and denominator
    from the same partial aggregation, no second scan."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2000-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-04-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = _revenue()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            round_half_up(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_pct")
        )
    )


@register(
    "q19_bracket_revenue",
    oracle=f"""
SELECT {sql_round("SUM(l.l_extendedprice * (1 - l.l_discount))", 2)} AS revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 21)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 30
       AND l.l_quantity >= 10 AND l.l_quantity <= 30)
   OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 50
       AND l.l_quantity >= 20 AND l.l_quantity <= 40)
""",
    tags=("join", "agg", "predicate"),
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction-of-conjunction brackets spanning
    both join sides. Catalyst extracts the common join key and pushes
    the side-local residuals (brand/size to the part scan, quantity to
    the lineitem scan via OR-derivation); the cross-side OR evaluates
    post-join in codegen — no fallback to a nested-loop plan."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(p, l.l_partkey == p.p_partkey)
    bracket = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 50)
           & F.col("l_quantity").between(20, 40))
    )
    return j.filter(bracket).agg(
        round_half_up(F.sum(_revenue()), 2).alias("revenue")
    )
