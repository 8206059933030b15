"""Bucketed (hash-clustered) tables: shuffle-free joins and aggregates.

The reference's only join shuffles nothing because pandas holds both
sides in driver memory (/root/reference/etl_project/assets/assets.py:93-102);
at 100 TB the equivalent lever is paying the hash-partition ONCE at
write time. ``bucketBy(n, key)`` hash-clusters every file of the table
by the key; Catalyst then knows the on-disk distribution and plans
joins between co-bucketed tables and aggregations on the bucket key
with NO Exchange — the scan itself satisfies the required
distribution. For a fact table joined daily on the same key (orders ⋈
lineitem on orderkey, events aggregated by user), this converts the
single most expensive recurring shuffle into a one-time write cost.

Catalog note: bucket metadata lives in the session catalog
(``saveAsTable``), not in the parquet files — Spark's own limitation,
identical on a cluster metastore. The data files are plain parquet and
remain readable path-wise; only the no-shuffle planning needs the
catalog entry. ``sortBy`` additionally orders within each bucket file,
so merge joins skip their sort and min/max row-group stats stay tight
for pushed-down range predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: tuple[str, ...],
    n_buckets: int = 8,
    sort_by: tuple[str, ...] = (),
) -> None:
    """Persist ``df`` hash-clustered into ``n_buckets`` per-key buckets.

    ``n_buckets`` sizes the parallelism floor for every downstream
    shuffle-free stage — at cluster scale pick it like you'd pick
    ``shuffle.partitions`` for this table's joins (hundreds to
    thousands); both join sides must match bucket count and keys for
    the exchange to be elided.
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *keys)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Scan a bucketed table — distribution metadata rides along from
    the catalog, which is what lets Catalyst skip the Exchange."""
    return spark.table(table)
