"""Exponential moving average per key — the canonical operator standard
SQL windows cannot express (each output depends recursively on the
previous output, not on a frame of inputs).

This is the designed escape hatch of the engine's operator taxonomy:
(a) compose built-ins when semantics allow; else (b) Arrow-batched
``applyInPandas`` per key group — which EMA needs. The recursion
y_t = (1-α)·y_{t-1} + α·x_t runs vectorized in pandas' C ewm kernel,
one Arrow exchange each way, grouped by key so the shuffle is the same
single hash partition a window would cost. NOT a row-at-a-time Python
UDF: per-group batches keep Python out of the per-row path.

Scale: state per task is one key group's rows (bounded by the largest
key's history, same bound any per-key sort has). For unbounded streams
the same recursion runs in ``applyInPandasWithState`` with y as the
state value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ewma_per_key(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    tiebreak: str = "event_id",
    alpha: float = 0.1,
    out_col: str = "ema",
) -> DataFrame:
    """Per-key EMA ordered by (ts, tiebreak), seeded at the first value
    (pandas ``ewm(adjust=False)`` semantics: y_1 = x_1). Emits the RAW
    double — cross-engine display rounding belongs to the caller
    (functions.scalars.round_half_up), not the kernel."""
    out_schema = (
        f"{key} long, {tiebreak} long, {ts} timestamp, {value} double, "
        f"{out_col} double"
    )

    def _ema(pdf):
        pdf = pdf.sort_values([ts, tiebreak])
        ema = pdf[value].ewm(alpha=alpha, adjust=False).mean()
        pdf = pdf.assign(**{out_col: ema})
        return pdf[[key, tiebreak, ts, value, out_col]]

    return (
        df.select(key, tiebreak, ts, value)
        .groupBy(key)
        .applyInPandas(_ema, schema=out_schema)
    )
