"""Warehouse-backed SCD Type-2 dimension store — the scale pairing the
merge operator's docstring calls for (operators/merge.py:15-19): the
CURRENT slice stays hot, the closed history never rides the shuffle —
or the write.

``scd2_merge`` is a pure transform: chained naively (read full dim ->
merge -> overwrite full dim) every batch re-reads AND re-writes the
accumulated history, so per-batch cost grows with dimension age even
though the merge's join only touches the current slice. This store
splits the physical layout instead:

    <table>__cur    the open versions only — one row per key, the hot
                    small fraction; OVERWRITTEN per batch (O(current)).
    <table>__hist   closed versions only — APPEND-ONLY, committed as
                    O(batch) manifest snapshots (sinks/warehouse.py
                    append): a batch that closes k versions writes k
                    rows, never the history.

Per-batch I/O is therefore O(|current| + |batch|) FOREVER — the chain's
cost curve is flat in the number of prior batches (measured:
tools/soak_scd2.py / SCALING.md round-8 row), while the naive
single-table chain grows linearly with accumulated closed versions.
This is the same physical idea as hive-partitioning one table on
``is_current`` and rewriting only the current partition; two tables
make the append-only invariant structural (a history partition inside
an overwritten snapshot would still be re-WRITTEN each batch by this
warehouse's full-snapshot overwrite).

``read()`` unions the two tables back into the exact frame the pure
operator chain produces — equivalence is pinned in tests/test_scd2.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.merge import SCD2_COLS, scd2_init, scd2_merge


class Scd2Store:
    """One SCD2 dimension bound to a warehouse: ``apply`` folds a source
    batch in; ``read``/``read_current`` serve the full history / the hot
    slice (the latter never lists a history file)."""

    def __init__(self, wh, table: str):
        self.wh = wh
        self.table = table
        self.cur_table = f"{table}__cur"
        self.hist_table = f"{table}__hist"

    def exists(self) -> bool:
        return self.wh.exists(self.cur_table)

    def apply(
        self,
        source: DataFrame,
        keys: tuple[str, ...],
        tracked: tuple[str, ...],
        stamp,
        close_missing: bool = False,
    ) -> None:
        """Fold one batch: first batch initializes (every row an open
        version); later batches merge against the CURRENT table only —
        the history table is neither read nor rewritten, just appended
        with the versions this batch closed.

        Not cross-table atomic (each table commits via its own pointer
        flip): the history append lands BEFORE the current flip, so a
        crash between them followed by a replay of the same batch would
        duplicate that batch's closed rows in history — the standard
        at-least-once seam; dedup history on (keys, valid_from) to
        recover, or gate replays with the pipeline run log. The reverse
        order would LOSE closed versions on the same crash, which is
        why append goes first."""
        if not self.exists():
            self.wh.overwrite(
                scd2_init(source, keys, stamp), self.cur_table
            )
            return
        cur = self.wh.read(self.cur_table)
        merged = scd2_merge(
            cur, source, keys, tracked, stamp, close_missing=close_missing
        )
        # one pass computed twice (open/closed split) — materialize so
        # the full-outer join doesn't replay per consumer
        from ..materialize import materialize

        merged = materialize(merged)
        closed = merged.filter(~F.col("is_current"))
        if self.wh.exists(self.hist_table):
            self.wh.append(closed, self.hist_table)
        else:
            self.wh.overwrite(closed, self.hist_table)
        self.wh.overwrite(merged.filter(F.col("is_current")), self.cur_table)

    def read_current(self) -> DataFrame:
        """The hot slice — scans only ``__cur`` files by construction
        (the layout guarantee a single-table design would need
        partition pruning to approximate)."""
        return self.wh.read(self.cur_table)

    def read(self) -> DataFrame:
        """The full versioned dimension (current ∪ closed) — column
        order normalized to value columns then SCD2_COLS, the
        scd2_merge output shape."""
        cur = self.wh.read(self.cur_table)
        cols = [c for c in cur.columns if c not in SCD2_COLS] + list(SCD2_COLS)
        cur = cur.select(*cols)
        if not self.wh.exists(self.hist_table):
            return cur
        return self.wh.read(self.hist_table).select(*cols).unionByName(cur)
