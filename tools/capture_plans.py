"""Capture .explain("formatted") for every registered query into
plans/<tag>/<name>_<suffix>.txt, plus a construction-time report:
how long the Python-side plan build of each query takes (driver eager
actions included) vs its noop-sink execution.

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]
e.g.   python tools/capture_plans.py r10 before
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stock_bars_data_engineering_project_spark.plans import QUERIES  # noqa: E402
from stock_bars_data_engineering_project_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or list(QUERIES)
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("capture_plans")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    for name in names:
        spec = QUERIES[name]
        jobs_before = len(tracker.getJobIdsForGroup() or [])
        t0 = time.time()
        df = spec.fn(spark, SF_DIR)
        t_build = time.time() - t0
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(f"-- query: {name}  sf_dir: {SF_DIR}\n")
            f.write(f"-- plan-construction wall: {t_build:.3f}s (driver eager actions included)\n\n")
            f.write(plan)
        print(f"{name}: build {t_build:.3f}s, plan {len(plan)} bytes", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
