"""S2 — nested-JSON "unnest" of the API bar payload.

The reference flattens ``{symbol: [bar, ...]}`` with a driver-side Python
loop (``/root/reference/etl_project/assets/assets.py:54-68``). Spark-first:
model the payload as ``MapType(symbol -> ArrayType(bar struct))`` and
explode twice — the whole flatten stays JVM-side inside whole-stage
codegen, and distributes across executors no matter how many symbols or
bars arrive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Bar struct as returned by the bars API: single-letter keys
# (close/high/low/trades/open/timestamp/volume/vwap); meanings fixed by the
# reference's rename map (/root/reference/etl_project/assets/assets.py:79-91).
BAR_STRUCT = T.StructType(
    [
        T.StructField("c", T.DoubleType()),
        T.StructField("h", T.DoubleType()),
        T.StructField("l", T.DoubleType()),
        T.StructField("n", T.LongType()),
        T.StructField("o", T.DoubleType()),
        T.StructField("t", T.StringType()),
        T.StructField("v", T.LongType()),
        T.StructField("vw", T.DoubleType()),
    ]
)

BARS_PAYLOAD_TYPE = T.MapType(T.StringType(), T.ArrayType(BAR_STRUCT))


def flatten_bars_json(df: DataFrame, payload_col: str = "bars") -> DataFrame:
    """Explode a map<symbol, array<bar>> column into one row per bar,
    injecting the map key as a ``symbol`` column — the distributed
    equivalent of the reference's flatten loop."""
    exploded = df.select(F.explode(F.col(payload_col)).alias("symbol", "bar_list"))
    bars = exploded.select("symbol", F.explode("bar_list").alias("bar"))
    return bars.select("symbol", "bar.*")


def parse_bars_payload(raw_json: Column) -> Column:
    """Parse a raw JSON string payload into the typed map-of-bars column."""
    return F.from_json(raw_json, BARS_PAYLOAD_TYPE)
