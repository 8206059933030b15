"""Range (interval) join: left.ts ∈ [right.lo, right.hi], bucketized.

Spark turns a raw BETWEEN join into BroadcastNestedLoopJoin (small right)
or a cartesian product (big right) — O(|L| x |R|) per key. The standard
scale fix is temporal bucketization: explode each right interval into
the fixed-width buckets it covers, bucket the left timestamps, and
equi-join on (keys..., bucket) — Catalyst then runs a plain shuffle/
broadcast HASH join — followed by the exact BETWEEN filter. Cost is
O(|L| + |R| x avg_interval/bucket) join input rows; pick the bucket
width near the median interval length so the explosion factor stays
small. A left row meets a given interval in exactly one bucket (its
own), so no post-join dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    lo: str = "lo",
    hi: str = "hi",
    by: tuple[str, ...] = (),
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Equi-join-shaped interval join: rows of ``left`` matched to every
    ``right`` interval with ``lo <= on <= hi`` (inclusive both ends),
    optionally co-keyed on ``by`` columns."""
    if how != "inner":
        # the exact BETWEEN runs as a post-join FILTER, which would
        # silently discard the null-padded rows an outer join exists to
        # produce; support inner only rather than lie about outer
        raise ValueError(
            "range_join supports how='inner' only (the BETWEEN residual "
            "is applied post-join and would drop outer null rows)"
        )
    # Column names shared between the two frames (beyond the join keys)
    # would make the unqualified BETWEEN references below ambiguous —
    # fail with the precondition spelled out instead of Spark's
    # AMBIGUOUS_REFERENCE (or a silent wrong-side resolution).
    overlap = (set(left.columns) & set(right.columns)) - set(by)
    if overlap:
        raise ValueError(
            f"range_join requires disjoint non-key column names; rename on "
            f"one side: {sorted(overlap)}"
        )
    lb = left.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(on)) / bucket_seconds)
    )
    rb = (
        right.withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(F.col(lo)) / bucket_seconds),
                    F.floor(F.unix_timestamp(F.col(hi)) / bucket_seconds),
                )
            ),
        )
    )
    return (
        lb.join(rb, [*by, "_bucket"], how)
        .filter((F.col(on) >= F.col(lo)) & (F.col(on) <= F.col(hi)))
        .drop("_bucket")
    )
