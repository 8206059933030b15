"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Timing uses a ``noop``-format write so every column of the result is
fully materialized through the physical plan (a ``count()`` would let
Catalyst prune the expensive window/score columns away).

Compare against DuckDB on the same machine with ``--duckdb`` (fills
BASELINE.md); the per-query oracle SQL is the workload definition.
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_QUERIES = [
    "flagship_analysis",
    "q1_pricing_summary",
    "j1_dim_join",
    "q3_shipping_priority",
    "q5_region_volume",
    "topk_per_group",
    "s6_sql_cte_chain",
    "win_tumbling_daily",
    "win_session_2h",
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "text_quality_score",
    "text_fingerprint",
    "contamination_check",
    "resample_ohlc_daily",
    "ann_topk_bruteforce",
    "ann_topk_ivf",
    "asof_join_marks",
    "ewma_per_user",
    "q10_returned_items",
    "tfidf_top_terms",
    "incremental_merge_upsert",
]


def bench_spark(sf_dir: str) -> dict[str, float]:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from stock_bars_data_engineering_project_spark.session import get_spark

    spark = get_spark("bench")
    qs = entrymod.queries()
    # absorb one-time session/JVM/file-index costs outside the timings
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        times[name] = round(time.time() - t0, 3)
    return times


def bench_duckdb(sf_dir: str) -> dict[str, float]:
    import duckdb

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    con.sql(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name not in oracles:
            continue
        t0 = time.time()
        con.sql(oracles[name]).fetchall()
        times[name] = round(time.time() - t0, 3)
    return times


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    if "--duckdb" in sys.argv:
        times = bench_duckdb(sf_dir)
        print(json.dumps({"engine": "duckdb", "queries": times, "sf": sf}))
        return
    times = bench_spark(sf_dir)
    print(
        json.dumps(
            {
                "metric": "headline query wall-clock, engine total",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
