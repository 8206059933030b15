"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's query registry
(``stock_bars_data_engineering_project_spark.plans``): every operator from SURVEY.md §2 (plus the
scale extensions) registers a named ``(spark, sf_dir) -> DataFrame``
callable and, where SQL-expressible, a DuckDB oracle twin with identical
column aliases.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from stock_bars_data_engineering_project_spark.plans import get_oracle_sql, get_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's full
    windowed-analytics pipeline (lag -> guarded rounded return -> 5-row
    moving avg/stddev) over events."""
    return get_queries()["flagship_analysis"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + extensions."""
    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin per query (omitted => rows-only check)."""
    return get_oracle_sql()
