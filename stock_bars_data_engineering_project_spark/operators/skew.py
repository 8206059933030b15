"""Skew mitigation for per-key rankings.

GroupBy aggregates get map-side partial aggregation for free, and AQE
splits skewed sort-merge-join partitions — but WINDOW functions have
neither: every row of a hot key lands in one task and sorts there. For
top-k that is wasted work (a key with 100M rows sorts 100M rows to keep
10): salting makes it two cheap phases.

  phase 1: partition by (key, salt) — salt = hash of the row's tiebreak
           column mod n_salt, so rows of a hot key spread over n_salt
           tasks — and keep each salt bucket's local top-k;
  phase 2: partition by (key) over the surviving k x n_salt rows per
           key and keep the global top-k.

Any row in the true global top-k is in its salt bucket's top-k, so the
result is exactly the unsalted answer (deterministic given a tie-free
ordering). Phase-2 input is bounded by k x n_salt per key regardless of
skew — the hot key's 100M rows never meet in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_topk(
    df: DataFrame,
    keys: tuple[str, ...],
    order_col: str,
    tiebreak_col: str,
    k: int,
    n_salt: int = 16,
    descending: bool = True,
) -> DataFrame:
    """Exact per-key top-k with bounded per-task fan-in. The ordering is
    (order_col, tiebreak_col) and must be tie-free — same contract as
    any deterministic ranking (README: correctness model)."""
    # fail loudly on working-column collisions: withColumn would
    # overwrite a caller's _salt/_rn/rank and drop() would then delete
    # their data from the output (same contract as sampling's _nt/_cum
    # guard)
    clash = {"_salt", "_rn", "rank"} & set(df.columns)
    if clash:
        raise ValueError(
            f"salted_topk writes columns {sorted(clash)} — rename them on "
            "the input first"
        )
    order = (
        [F.col(order_col).desc(), F.col(tiebreak_col)]
        if descending
        else [F.col(order_col), F.col(tiebreak_col)]
    )
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(tiebreak_col)), F.lit(n_salt))
    )
    w1 = Window.partitionBy(*keys, "_salt").orderBy(*order)
    local = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        local.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )
