"""Heavy hitters at bounded memory — mergeable Misra-Gries summaries.

The "frequent items" primitive a 100 TB pipeline reaches for when even
the aggregated key space is too large to shuffle comfortably (every
URL, every n-gram, every user agent): an exact ``groupBy(item)`` over
a Zipf-tailed key column shuffles hundreds of billions of distinct
keys to answer a question about the top fifty. Misra-Gries bounds the
state at ``k`` counters PER PARTITION, with the classic guarantees
(Misra & Gries 1982; mergeability per Agarwal et al., PODS'12):

- every item with true count > n/k survives to the merged summary
  (the decrement budget d_i of partition i is at most n_i/k, and the
  union merge preserves any item some partition kept);
- each merged counter is a LOWER bound on the item's true count, and
  the true count is at most counter + Σ d_i — so the summary carries
  its own error bar.

Shape: one Arrow-batched ``mapInPandas`` pass emits ≤ k counter rows
plus one decrement-budget row per partition; the merge is a groupBy
over ≤ k × partitions rows (thousands, not billions). Each pandas
batch is pre-reduced with ``value_counts`` and folded in by the
weighted-merge form of the algorithm: absorb the batch counts, then if
more than ``k`` counters remain subtract the (k+1)-th largest value
from all of them and keep the positives — one uniform subtraction per
fold, whose size accumulates into the partition's decrement budget.

This module keeps the sketch HONEST rather than replacing the exact
answer in the gate: the driver arm value-gates the exact heavy-hitter
set (SQL-replayable) and pins the sketch's three guarantees — superset,
bounds, bounded size — as law flags computed against the exact counts.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MG_SCHEMA = "pid long, item string, lo long, d long"


def mg_summaries(df: DataFrame, item_col: str, k: int = 64) -> DataFrame:
    """Per-partition Misra-Gries summaries of ``item_col``: counter rows
    ``(pid, item, lo, 0)`` (at most ``k`` per partition) plus ONE budget
    row ``(pid, NULL, 0, d)`` per non-empty partition carrying the
    partition's total decrement. NULL items are ignored (they cannot be
    heavy hitters of a keyed aggregation)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    import pandas as pd

    def _mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        counters: dict[str, int] = {}
        d = 0
        seen = False
        for pdf in batches:
            col = pdf[item_col].dropna()
            if col.empty:
                continue
            seen = True
            for item, c in col.value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                # weighted reduction: subtract the (k+1)-th largest
                # value from every counter, keep positives — one
                # uniform subtraction, so the error bound grows by
                # exactly t
                t = sorted(counters.values(), reverse=True)[k]
                d += t
                counters = {x: c - t for x, c in counters.items() if c > t}
        if not seen:
            return
        out = {
            "pid": [pid] * (len(counters) + 1),
            "item": list(counters) + [None],
            "lo": list(counters.values()) + [0],
            "d": [0] * len(counters) + [d],
        }
        yield pd.DataFrame(out)

    return df.select(item_col).mapInPandas(_mg, schema=_MG_SCHEMA)


def merged_heavy_hitters(
    summaries: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Union-merge of per-partition summaries: ``(candidates, budget)``
    where candidates is ``(item, lo)`` — lo a true-count lower bound —
    and budget is the 1-row total decrement Σ d_i; the true count of
    ANY item (candidate or not) is at most its lo (0 if absent) plus
    that budget."""
    cand = (
        summaries.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("lo").alias("lo"))
    )
    budget = summaries.filter(F.col("item").isNull()).agg(
        F.coalesce(F.sum("d"), F.lit(0)).alias("total_d")
    )
    return cand, budget
