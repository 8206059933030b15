"""Round-10 helper-construction profiler.

Measures DRIVER-SIDE construction cost (wall + py4j send_command count)
of individual expression helpers — the guide §4 boundary applied to the
driver. py4j counts are machine-load-independent, so this is valid even
on a busy box; wall times are indicative only.

Usage: python tools/profile_build_helpers.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from py4j import java_gateway

from stock_bars_data_engineering_project_spark.session import get_spark


def main() -> None:
    spark = get_spark("profile-build-helpers")
    from pyspark.sql import functions as F

    from stock_bars_data_engineering_project_spark.functions import text as TX
    from stock_bars_data_engineering_project_spark.functions import vectors as V
    from stock_bars_data_engineering_project_spark.functions.scalars import (
        round_half_up,
    )
    from stock_bars_data_engineering_project_spark.operators.similarity import l2sq

    # count py4j round trips
    counter = {"n": 0}
    orig = java_gateway.GatewayConnection.send_command

    def counting(self, *a, **k):
        counter["n"] += 1
        return orig(self, *a, **k)

    java_gateway.GatewayConnection.send_command = counting

    t = F.col("text")

    cases = {
        "tokens+token_count": lambda: TX.token_count(t),
        "stopword_ratio": lambda: TX.stopword_ratio(t),
        "punct_ratio": lambda: TX.punct_ratio(t),
        "mean_word_len": lambda: TX.mean_word_len(t),
        "lang_id": lambda: TX.lang_id(t),
        "quality_score": lambda: TX.quality_score(t),
        "bpe_ish_token_count": lambda: TX.bpe_ish_token_count(t),
        "rolling_fingerprint": lambda: TX.rolling_fingerprint(t),
        "cosine(col,col)": lambda: V.cosine(F.col("a"), F.col("b")),
        "dot(col,col)": lambda: V.dot(F.col("a"), F.col("b")),
        "norm(col)": lambda: V.norm(F.col("a")),
        "unit_normalize(col)": lambda: V.unit_normalize(F.col("a")),
        "l2sq(col,col)": lambda: l2sq(F.col("a"), F.col("b")),
        "quantize_int8(col)": lambda: V.quantize_int8(F.col("a")),
        "round_half_up": lambda: round_half_up(F.col("a"), 4),
        "F.expr(parse 1k chars)": lambda: F.expr(
            "aggregate(zip_with(transform(a, x -> CAST(x AS DOUBLE)), "
            "transform(b, x -> CAST(x AS DOUBLE)), (x, y) -> x * y), 0.0D, "
            "(acc, v) -> acc + v)"
        ),
    }

    print(f"{'helper':32s} {'py4j':>6s} {'ms (min of 5)':>14s}")
    for name, fn in cases.items():
        fn()  # warm (imports, first-parse caches)
        best = float("inf")
        calls = 0
        for _ in range(5):
            c0 = counter["n"]
            t0 = time.perf_counter()
            fn()
            dt = (time.perf_counter() - t0) * 1000
            calls = counter["n"] - c0
            best = min(best, dt)
        print(f"{name:32s} {calls:6d} {best:14.2f}")

    spark.stop()


if __name__ == "__main__":
    main()
