"""Scalar expression helpers (SURVEY §2.6, X1-X8).

All JVM-side Column expressions — no Python UDFs — so they stay inside
whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nullif_zero(col: Column) -> Column:
    """X4 — NULLIF(col, 0): division-by-zero guard (SURVEY Q2; reference
    SQL /root/reference/etl_project/assets/sql/transform/stock_bars_analysis.sql:21).
    Spark's non-ANSI mode already yields NULL on /0, but the explicit guard
    keeps semantics identical under ``spark.sql.ansi.enabled=true``."""
    return F.nullif(col, F.lit(0))


def round_half_up(col: Column, scale: int) -> Column:
    """X3 — ROUND(x, n), HALF_UP, stable across engines.

    Naive ``round(double, n)`` differs between engines on boundary values:
    Spark rounds the double's exact decimal expansion (BigDecimal HALF_UP),
    DuckDB/Postgres round a scaled double (``x*10^n`` reintroduces FP
    error), so ~0.1% of rows disagree at the target digit. Routing through
    an intermediate ``decimal(30,10)`` makes both engines round the same
    exact decimal; oracles use ``sql_round()`` for the identical SQL form.
    """
    return F.round(col.cast("decimal(30,10)"), scale).cast("double")


def sql_round(expr: str, scale: int) -> str:
    """ANSI-SQL twin of :func:`round_half_up` for DuckDB oracles."""
    return f"CAST(ROUND(CAST({expr} AS DECIMAL(30,10)), {scale}) AS DOUBLE)"


def guarded_ratio(numerator: Column, denominator: Column, scale: int = 3) -> Column:
    """The reference's daily-return expression (SURVEY Q2+Q3):
    ``round(num / nullif(den, 0), scale)`` — rounded FIRST, before any
    downstream use (the 5-row stddev runs over this rounded value)."""
    return round_half_up(numerator / nullif_zero(denominator), scale)
