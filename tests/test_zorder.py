"""Z-order layout: per-file parquet min/max stats must stay tight on
EVERY z-dimension, which is what makes footer-stats skipping work for
predicates on any of them."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from stock_bars_data_engineering_project_spark.sinks.warehouse import ParquetWarehouse
from stock_bars_data_engineering_project_spark.sources.readers import load_table

SF = "/root/testdata/sf0.01"
N_FILES = 8


def _file_coverage(table_dir: str, cols: list[str]) -> dict[str, float]:
    """Average fraction of each column's global range covered by one
    data file (1.0 = every file spans the whole range: no skipping)."""
    paths = [
        p
        for p in glob.glob(os.path.join(table_dir, "**", "*.parquet"), recursive=True)
        if os.path.getsize(p) > 0
    ]
    assert paths
    spans: dict[str, list[tuple[float, float]]] = {c: [] for c in cols}
    for p in paths:
        md = pq.ParquetFile(p).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        per_file: dict[str, tuple[float, float]] = {}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for c in cols:
                st = rg.column(names[c]).statistics
                lo, hi = float(st.min), float(st.max)
                cur = per_file.get(c)
                per_file[c] = (
                    (min(cur[0], lo), max(cur[1], hi)) if cur else (lo, hi)
                )
        for c, (lo, hi) in per_file.items():
            spans[c].append((lo, hi))
    out = {}
    for c, pairs in spans.items():
        glo = min(lo for lo, _ in pairs)
        ghi = max(hi for _, hi in pairs)
        width = (ghi - glo) or 1.0
        out[c] = sum((hi - lo) / width for lo, hi in pairs) / len(pairs)
    return out


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wh"))
    wh = ParquetWarehouse(spark, root)
    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    wh.overwrite(ev, "ev_linear", cluster_by=("user_id", "value"), n_files=N_FILES)
    wh.overwrite(ev, "ev_zorder", zorder_by=("user_id", "value"), n_files=N_FILES)
    return {
        "linear": os.path.join(wh.table_path("ev_linear")),
        "zorder": os.path.join(wh.table_path("ev_zorder")),
        "wh": wh,
    }


def test_zorder_tightens_all_dimensions(layouts):
    lin = _file_coverage(layouts["linear"], ["user_id", "value"])
    zo = _file_coverage(layouts["zorder"], ["user_id", "value"])
    # lexicographic: leading column tight, trailing column mostly loose
    assert lin["user_id"] < 0.3
    assert lin["value"] > 0.6
    # z-order: BOTH dimensions materially tighter than the full range
    # (with n files and 2 dims, ~n^-1/2 per dim is the ideal)
    assert zo["user_id"] < 0.5
    assert zo["value"] < 0.5
    # the real claim: the WORST dimension improves — a predicate on any
    # z-dimension skips files, where linear clustering leaves whichever
    # column trails the sort order unskippable
    assert max(zo.values()) < max(lin.values())


def test_zorder_preserves_rows(spark, layouts):
    wh = layouts["wh"]
    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    got = wh.read("ev_zorder")
    assert got.count() == ev.count()
    assert got.columns == ev.columns  # _zorder key never lands in the table
    assert (
        got.agg(F.sum("event_id")).first()[0] == ev.agg(F.sum("event_id")).first()[0]
    )


# -- skew-robust quantile scaler --------------------------------------------


def _skewed(spark, n=20000):
    # 99% of x mass in [0, 100), a 1% outlier tail at ~1e9; y uniform.
    # min/max scaling maps every normal row to x-cell 0.
    return spark.range(n).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 100 == 0, F.col("id") * F.lit(50000) + F.lit(10**9))
        .otherwise(F.col("id") % 100)
        .cast("double")
        .alias("x"),
        (F.col("id") % 64).cast("double").alias("y"),
    )


def test_quantile_zorder_preserves_rows_and_schema(spark, tmp_path):
    wh = ParquetWarehouse(spark, str(tmp_path))
    df = _skewed(spark)
    wh.overwrite(df, "t", zorder_by=("x", "y"), zorder_scaler="quantile", n_files=8)
    got = wh.read("t")
    assert got.columns == df.columns
    assert got.count() == df.count()
    assert (
        got.agg(F.sum("row_id")).first()[0] == df.agg(F.sum("row_id")).first()[0]
    )


def test_quantile_zorder_skips_where_minmax_cannot(spark, tmp_path):
    # the skew claim, measured end to end through the stats planner:
    # a range predicate INSIDE the hot region prunes files under the
    # equal-mass grid and cannot under min/max scaling (outlier tail
    # collapses all normal rows into grid cell 0)
    wh = ParquetWarehouse(spark, str(tmp_path))
    df = _skewed(spark)
    wh.overwrite(df, "mm", zorder_by=("x", "y"), n_files=8)
    wh.overwrite(df, "qt", zorder_by=("x", "y"), zorder_scaler="quantile", n_files=8)
    ranges = {"x": (10.0, 19.0)}
    mm = wh.skip_files("mm", ranges)
    qt = wh.skip_files("qt", ranges)
    assert len(mm) == len(wh.data_files("mm"))  # min/max grid: no pruning
    assert len(qt) < len(wh.data_files("qt"))  # equal-mass grid: prunes
    # and the pruned read stays exact
    got = wh.read_skipped("qt", ranges)
    expect = wh.read("qt").where(F.col("x").between(10.0, 19.0))
    assert sorted(r["row_id"] for r in got.collect()) == sorted(
        r["row_id"] for r in expect.collect()
    )


def test_quantile_zorder_null_rows_survive(spark, tmp_path):
    from stock_bars_data_engineering_project_spark.functions.zorder import (
        with_zorder_key,
    )

    df = spark.range(10).select(
        F.col("id"),
        F.when(F.col("id") < 3, None).otherwise(F.col("id").cast("double")).alias("x"),
        F.col("id").cast("double").alias("y"),
    )
    keyed = with_zorder_key(df, ("x", "y"), scaler="quantile")
    assert keyed.count() == 10
    assert keyed.filter(F.col("_zorder").isNull()).count() == 0


def test_zorder_rejects_unknown_scaler(spark):
    from stock_bars_data_engineering_project_spark.functions.zorder import (
        with_zorder_key,
    )

    df = spark.range(5).select(F.col("id").cast("double").alias("x"))
    try:
        with_zorder_key(df, ("x",), scaler="nope")
        raise AssertionError("unknown scaler must refuse")
    except ValueError as e:
        assert "scaler" in str(e)


def test_quantile_scaler_ignores_minmax_working_names(spark):
    from stock_bars_data_engineering_project_spark.functions.zorder import (
        with_zorder_key,
    )

    # _lo_x/_hi_x are the MINMAX path's working names; the quantile path
    # never creates them and must not refuse over them
    df = spark.range(20).select(
        F.col("id").cast("double").alias("x"),
        F.lit(0.0).alias("_lo_x"),
    )
    keyed = with_zorder_key(df, ("x",), scaler="quantile")
    assert keyed.count() == 20
