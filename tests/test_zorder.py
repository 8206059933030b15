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
