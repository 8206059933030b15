"""Vector (embedding) column functions — JVM-side array arithmetic.

Embeddings live as ``array<float>`` columns; all math promotes to double
FIRST so results are bit-identical with the DuckDB oracle's
double-precision sums (float accumulation orders would diverge).
``F.zip_with`` + ``F.aggregate`` keep the dot product inside codegen —
no Python, no UDF, no serialization per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold sum — same accumulation order as the oracle's
    index-ordered list_sum, so doubles match exactly. Promotes both
    sides itself: the module contract ("all math promotes to double
    FIRST") must hold for every entry point, not only cosine — a caller
    handing raw ``array<float>`` would otherwise accumulate float32
    products that diverge from the oracle in the rounded digits. The
    double promotion of an already-double array folds away in Catalyst,
    so pre-cast callers pay nothing."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
