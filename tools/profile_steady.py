"""Steady-state per-query profile: split plan-construction wall (Python
+ py4j + driver eager actions, memos warm) from noop-sink execution
wall, per repeat. Mirrors bench.py methodology (gc fence, warmed
session) but reports the two components the bench sums.

Usage: python tools/profile_steady.py query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stock_bars_data_engineering_project_spark.plans import QUERIES  # noqa: E402
from stock_bars_data_engineering_project_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = 3


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("profile_steady")
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    out = {}
    for name in names:
        fn = QUERIES[name].fn
        rows = []
        for i in range(REPEATS):
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            df = fn(spark, SF_DIR)
            t1 = time.time()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.time()
            rows.append({"build": round(t1 - t0, 3), "exec": round(t2 - t1, 3)})
        out[name] = rows
        print(name, json.dumps(rows), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
