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


def unit_normalize(vec: Column) -> Column:
    """L2-normalize to unit length (the storage form that turns cosine
    into a plain dot product downstream). A zero vector has no
    direction and passes through unchanged (as doubles) rather than
    becoming NaNs — IEEE double division would not error under ANSI,
    it would silently poison every later similarity."""
    v = as_double(vec)
    nrm = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    return F.when(nrm > 0, F.transform(v, lambda x: x / nrm)).otherwise(v)


def truncate_dims(vec: Column, d: int, renormalize: bool = True) -> Column:
    """Matryoshka-style dimension truncation: keep the first ``d``
    components (MRL-trained embeddings order information by prefix), by
    default re-normalized so downstream cosine stays calibrated. A
    vector shorter than ``d`` is a data error and surfaces loudly."""
    if d < 1:
        raise ValueError(f"d must be >= 1, got {d}")
    checked = F.when(F.size(vec) >= d, F.slice(vec, 1, d)).otherwise(
        F.raise_error(F.lit(f"truncate_dims: vector shorter than d={d}"))
    )
    return unit_normalize(checked) if renormalize else as_double(checked)


def quantize_int8(vec: Column) -> Column:
    """Symmetric per-vector int8 quantization for embedding storage:
    struct(scale double, q array<tinyint>) with scale = max|x|/127 and
    q = round_half_up(x/scale). 4x smaller at rest than float32 (16x
    vs the double math form); reconstruction error is bounded by
    scale/2 per component. The zero vector quantizes to scale 0 + all
    zeros and dequantizes exactly."""
    v = as_double(vec)
    maxabs = F.array_max(F.transform(v, F.abs))
    scale = maxabs / 127.0
    q = F.when(
        maxabs > 0,
        # floor(x+0.5) is HALF_UP toward +inf on both engines; Spark's
        # bround would bank-round ties and round() on negative halves
        # differs from DuckDB — the scalars.round_half_up discipline
        F.transform(v, lambda x: F.floor(x / scale + 0.5).cast("tinyint")),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint")))
    return F.struct(
        F.coalesce(scale, F.lit(0.0)).alias("scale"), q.alias("q")
    )


def dequantize_int8(qs: Column) -> Column:
    """Inverse of :func:`quantize_int8`: array<double> reconstruction."""
    return F.transform(qs["q"], lambda x: x.cast("double") * qs["scale"])
