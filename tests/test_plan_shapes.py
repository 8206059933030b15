"""Physical-plan regression tests: the scale properties this engine
relies on (pushdown, broadcast, shared window sort, group-limit
pruning) asserted from `.explain` output so a refactor cannot silently
regress them."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from stock_bars_data_engineering_project_spark.plans import get_queries

SF = "/root/testdata/sf0.01"


def _plan(spark, name):
    df = get_queries()[name](spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_dim_join_is_broadcast(spark):
    plan = _plan(spark, "j1_dim_join")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pricing_filter_pushed_to_scan(spark):
    plan = _plan(spark, "q1_pricing_rollup")
    assert "LessThanOrEqual(l_shipdate" in plan  # reaches PushedFilters


def test_incremental_range_pushed_as_nanos(spark):
    # both the F2 watermark range AND the F1 equality predicate must
    # reach the parquet scan's PushedFilters
    plan = _plan(spark, "fx_filter_scalar_suite")
    assert "GreaterThanOrEqual(ts," in plan
    assert "EqualTo(event_type,purchase)" in plan


def test_flagship_windows_share_one_sort(spark):
    plan = _plan(spark, "flagship_analysis")
    assert plan.count("Window") >= 2
    # both window nodes ride a single exchange+sort pair
    assert plan.count("+- Exchange") == 1
    assert plan.count("+- Sort") == 1


def test_topk_uses_window_group_limit(spark):
    # the rank<=3 filter inside tfidf_vocab_suite must be pruned into a
    # per-partition top-k before any full sort materializes
    plan = _plan(spark, "tfidf_vocab_suite")
    assert "WindowGroupLimit" in plan


def test_metadata_projection_prunes_columns(spark):
    plan = _plan(spark, "multimodal_binary_meta")
    # only the needed columns reach the scan, never a full-row read
    assert "ReadSchema: struct<doc_id" in plan
    assert "lang" not in plan.split("ReadSchema")[1][:200]


def test_q10_topk_avoids_global_sort(spark):
    plan = _plan(spark, "q10_returned_items")
    # top-20 planned as TakeOrderedAndProject, not a full sort + limit
    assert "TakeOrderedAndProject" in plan


def test_q5_region_nation_broadcast(spark):
    plan = _plan(spark, "q5_region_volume")
    # the tiny region/nation dims never shuffle a fact side
    assert "BroadcastHashJoin" in plan
    # orderdate range predicate reaches the parquet scan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_q18_aggregates_before_join(spark):
    plan = _plan(spark, "q18_large_orders")
    # the HAVING subquery pre-reduces lineitem before any join: the
    # aggregate must appear below the join in the formatted tree
    agg = plan.index("HashAggregate")
    join = plan.index("Join")
    assert agg > join  # formatted plan lists children after parents


def test_anti_and_semi_join_types(spark):
    plan = _plan(spark, "set_ops_suite")
    assert "LeftAnti" in plan
    assert "LeftSemi" in plan
    # the orders side is filtered before joining
    assert "EqualTo(o_orderpriority,1-URGENT)" in plan


# Queries allowed to contain a BroadcastNestedLoopJoin: each crosses the
# corpus against a SMALL broadcast side by design (ANN query sets /
# centroid tables), so the NLJ's build side is O(k), not a fact table.
_NLJ_ALLOWED = {
    "ann_topk_suite",
    # single-row scalar broadcasts (corpus size / global total) — the
    # scalar-subquery pattern; the NLJ build side is exactly one row
    "tfidf_vocab_suite",
    "stats_suite",
    "a_scan_aggregates",
    # alpha arm: per-stratum counts x broadcast 1-row global min —
    # build side is one row, probe side is stratum cardinality
    "sampling_splits_suite",
    # n_docs + avgdl ride as broadcast 1-row aggregates into the
    # scoring join (the same scalar-subquery pattern)
    "bm25_topk_docs",
    # paragraphs arm: corpus count broadcasts 1 row to derive the
    # deterministic partner key
    "decontam_suite",
    # semdedup arm: ivf_assign's centroid table collapses to ONE row
    # (the cid-sorted centroid array) broadcast into the map-only
    # argmin — the same reason the ann_topk rows are listed
    "dedup_embedding_pairs",
    # attribution arm's 'none' bucket: 1-row total-conversions x 1-row
    # credited-count cross — two broadcast scalars, the same
    # scalar-subquery pattern as the rows above
    "user_event_sequences",
}


def test_no_query_plans_a_scale_hazard(spark):
    """Global audit: no registered batch query may plan a cartesian
    product, a row-at-a-time Python eval, or an unexpected broadcast
    nested-loop join — the three shapes that melt at 100 TB."""
    from stock_bars_data_engineering_project_spark.plans import get_queries

    offenders = {}
    for name, fn in get_queries().items():
        if name.startswith("stream_"):
            continue  # these execute a streaming drain on call
        plan = _plan_of(fn(spark, "/root/testdata/sf0.001"))
        bad = [m for m in ("CartesianProduct", "BatchEvalPython") if m in plan]
        if "BroadcastNestedLoopJoin" in plan and name not in _NLJ_ALLOWED:
            bad.append("BroadcastNestedLoopJoin")
        if bad:
            offenders[name] = bad
    assert not offenders, offenders


def _plan_of(df):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """A hive-partitioned fact joined to a selectively-filtered dim must
    plan a dynamicpruning subquery on the fact scan — at 100 TB this is
    the difference between scanning one partition and scanning the
    table. Pinned here so a layout or join-shape refactor cannot
    silently drop it."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    fact = orders.withColumn("yr", F.year(F.to_date("o_orderdate")))
    fact.write.mode("overwrite").partitionBy("yr").parquet(f"{tmp_path}/fact")
    dim = spark.createDataFrame([(1995, "keep"), (1990, "drop")], "yr int, label string")
    j = spark.read.parquet(f"{tmp_path}/fact").join(
        dim.filter(F.col("label") == "keep"), "yr"
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        j.explain("formatted")
    assert "dynamicpruning" in buf.getvalue().lower()


def test_bloom_runtime_filter_injects_on_selective_join(spark):
    """With the runtime bloom filter enabled, a shuffle join against a
    selectively-filtered build side plants bloom_filter_agg /
    might_contain on the probe side — rows that cannot match are
    dropped BEFORE the shuffle (the runtime analog of the static
    pushdowns pinned above). Config-gated, so pin the mechanism works
    in this Spark build; restore session confs after."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        sel = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
        j = li.join(sel, li.l_orderkey == sel.o_orderkey)
        buf = io.StringIO()
        with redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan.lower()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dedup_paragraphs_plan_shape(spark):
    """The paragraph keeper must (a) never plan a cartesian/Python
    node, (b) compute the winner as a PARTIAL-aggregable min so the
    hot boilerplate paragraph collapses map-side (no window over the
    paragraph key), (c) never shuffle paragraph text — only the 32-char
    md5 key crosses the winner join."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from stock_bars_data_engineering_project_spark.operators.contamination import (
        dedup_paragraphs,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha {i}\n\nshared paragraph body") for i in range(4)],
        "doc_id long, text string",
    )
    df = dedup_paragraphs(docs)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # winner = partial min(struct), not a window over the key
    assert "partial_min" in plan
    assert "Window" not in plan
