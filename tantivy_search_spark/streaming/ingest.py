"""Structured-Streaming index ingest.

The reference's incremental flow is batch-append + commit + reader
reload (B4/B5/Q14); the Spark-native equivalent is a streaming sink
that applies ``IndexBuilder.append`` per micro-batch via foreachBatch.
Not required by north_rule (the reference has no streaming operators —
SURVEY.md §2.5), provided as the idiomatic ingestion path for a live
corpus feed.

Each micro-batch is one append: new doc-range parts, additive posting
rows, stats refresh — so a crash between batches leaves a consistent,
queryable index, and checkpointLocation gives exactly-once batch
tracking on the stream side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from tantivy_search_spark.config import IndexConfig
from tantivy_search_spark.index.builder import IndexBuilder


def stream_ingest(
    spark: SparkSession,
    stream_df: DataFrame,
    index_path: str,
    config: IndexConfig,
    rows_per_part: int = 250_000,
    checkpoint_dir: str | None = None,
    order_cols: list[str] | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Attach the index as a foreachBatch sink of ``stream_df``.

    The first batch bootstraps the index with ``build``; later batches
    ``append``.  Returns the StreamingQuery (caller awaits/stops)."""
    builder = IndexBuilder(spark, index_path, config, rows_per_part)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        import os

        if not os.path.exists(os.path.join(index_path, "_index_meta.json")):
            builder.build(batch_df, order_cols=order_cols
                          or config.columns)
        else:
            builder.append(batch_df, order_cols=order_cols
                           or config.columns)

    writer = stream_df.writeStream.foreachBatch(sink).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
