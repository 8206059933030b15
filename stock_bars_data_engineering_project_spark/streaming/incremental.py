"""Structured-Streaming incremental ingest: the reference's manual
"poll since checkpoint -> upsert -> advance watermark" loop (SURVEY
§2.8, C1-C4) expressed as a streaming query with a keyed-merge sink.

``readStream`` discovers new files; ``foreachBatch`` applies each
micro-batch as a MERGE into the warehouse (idempotent under replay —
exactly the reference's Q9 healing property, but with the checkpointing,
offset tracking, and restart semantics supplied by the engine instead of
hand-rolled SQL). Structured Streaming's checkpointLocation replaces the
reference's ``check_points`` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sinks.warehouse import ParquetWarehouse


def incremental_merge_stream(
    spark: SparkSession,
    src_dir: str,
    schema,
    wh: ParquetWarehouse,
    table: str,
    keys: tuple[str, ...],
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Stream files from ``src_dir`` into ``table`` via keyed merge.

    With ``available_now`` the query drains everything currently present
    and stops — a scheduled-batch deployment identical in semantics to
    the reference's weekly ECS task, but restartable and exactly-once at
    the sink (merge idempotency + offset checkpoint).
    """
    src = spark.readStream.schema(schema).parquet(src_dir)

    def _apply(batch: DataFrame, epoch_id: int) -> None:
        wh.merge(batch, table, keys=keys)

    writer = (
        src.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
