"""K3 as a pure relational operator: keyed upsert of a source batch into
a target frame — ``MERGE … WHEN MATCHED UPDATE SET * WHEN NOT MATCHED
INSERT *`` (reference: INSERT .. ON CONFLICT DO UPDATE,
/root/reference/etl_project/connectors/postgresql.py:79-91) expressed as
dedup + anti-join + union. The warehouse sink wraps this with snapshot
commits; here it is also independently usable/testable as a transform.

Scale: one shuffle of each side on the key columns (sort-merge or, when
the batch is small, broadcast anti-join chosen by Catalyst/AQE). With a
date-partitioned target the warehouse variant prunes the rewrite to
touched partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def upsert_frames(
    target: DataFrame,
    source: DataFrame,
    keys: tuple[str, ...],
    allow_schema_drift: bool = False,
    source_unique: bool = False,
) -> DataFrame:
    """Rows of ``source`` win on key collision; target rows without a
    colliding key survive. Source is deduped on the keys first (Q6 — the
    reference's one-statement-one-key contract, made explicit) unless
    the caller vouches with ``source_unique=True`` (it already deduped —
    skipping the redundant key-shuffle of the batch).

    With ``allow_schema_drift`` the union tolerates asymmetric columns
    (Delta-style additive schema evolution): columns new in the source
    backfill NULL on old target rows, columns the source dropped carry
    NULL on new rows. Key columns must exist on both sides regardless.
    Default is strict — silent drift is a bug in most pipelines.
    """
    from pyspark.sql import functions as F

    # Explicit aliases: target and source often share lineage (an
    # incremental re-extract of the same table), and attribute-based
    # join conditions on shared lineage degrade into trivially-true
    # self-comparisons. Name-qualified columns resolve unambiguously.
    if not source_unique:
        source = source.dropDuplicates(list(keys))
    src = source.alias("__upsert_src")
    tgt = target.alias("__upsert_tgt")
    on = [
        F.col(f"__upsert_src.{k}").eqNullSafe(F.col(f"__upsert_tgt.{k}"))
        for k in keys
    ]
    kept = tgt.join(src, on=on, how="left_anti")
    return kept.unionByName(src, allowMissingColumns=allow_schema_drift)
