"""Bucketed managed tables — shuffle-free co-located joins.

The reference delegates all join execution to PostgreSQL
(/root/reference/etl_project/assets/assets.py:93-102 does the one join
in pandas; everything else is server-side SQL). At 100 TB the dominant
join cost in Spark is the shuffle of both fact sides; the Spark-native
answer is bucketing: write both tables hash-clustered on the join key
into the same number of buckets, and Catalyst's bucketed scan feeds a
sort-merge join with NO Exchange on either side — the shuffle is paid
once at write time and amortized over every subsequent join.

This is Spark's `bucketBy` + `saveAsTable` (managed catalog tables;
plain `.parquet()` paths cannot carry bucket metadata). Bucket counts
must match (or divide evenly, with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``) for the
exchange-free plan to apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int = 32,
    sort_cols: tuple[str, ...] = (),
) -> None:
    """Write ``df`` as a managed parquet table hash-bucketed on
    ``bucket_cols``. ``sort_cols`` additionally sorts within each bucket
    file, which lets the bucketed sort-merge join skip its Sort node too
    (and gives parquet min/max pruning on the sort key).

    Sizing rule at scale: pick ``n_buckets`` so one bucket of the LARGER
    table is a few hundred MB (bucket = unit of join parallelism; too
    few buckets caps parallelism, too many makes small files).
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def co_bucketed_join(
    spark: SparkSession, left: str, right: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two tables previously written by ``write_bucketed`` on their
    bucket key. With matching bucket counts Catalyst plans a sort-merge
    join whose children are bucketed scans — `.explain` shows no
    Exchange above either scan (asserted in tests/test_bucketed.py).
    """
    return spark.table(left).join(spark.table(right), on=on, how=how)
