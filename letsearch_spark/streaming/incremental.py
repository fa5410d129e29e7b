"""Structured Streaming: incremental collection maintenance + windowed
event rollups.

The reference is batch-only; its closest analogs are the append path
(S3/S4, collection_actor.rs:222-291) and incremental indexing (K5,
collection_actor.rs:808-826). Here both become streaming-native
(SURVEY.md §2.7 streaming note):

* :func:`stream_append_collection` -- a file-source stream feeding a
  Collection through ``foreachBatch``: each micro-batch appends rows
  with continued dense keys and embeds ONLY the new rows (the anti-join
  K5 semantics). Exactly-once per batch via the checkpoint dir; the
  final state equals a single bulk ingest (tested).
* :func:`windowed_event_counts` -- tumbling-window counts with
  watermarked late-data handling over an events stream; the batch twin
  is the hour tier of queries.py q_events_time_rollup, so correctness is checkable without a
  streaming oracle.

At scale: file sources list incrementally (maxFilesPerTrigger bounds
batch size); state for the windowed agg is bounded by the watermark.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def ensure_event_time(df, ts_col: str):
    """Return (df, was_ntz): watermarks require TIMESTAMP (with local
    timezone); parquet written with naive timestamps is read back as
    TIMESTAMP_NTZ, which Spark rejects as an event-time column. Cast to
    TIMESTAMP for the watermark -- a wall-clock identity under the
    engine's pinned UTC session timezone (session.py) -- and let callers
    cast window bounds back so batch twins and oracles keep comparing
    like-typed values."""
    was_ntz = dict(df.dtypes).get(ts_col) == "timestamp_ntz"
    if was_ntz:
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df, was_ntz


def stream_append_collection(
    spark,
    coll,
    source_dir: str,
    schema,
    checkpoint_dir: str,
    max_files_per_trigger: int = 10,
    embed: bool = True,
):
    """Stream parquet files from ``source_dir`` into ``coll``.

    Returns the StreamingQuery; caller awaits/stops it. Each micro-batch
    runs the batch append path (key continuation) and the incremental
    embed (left-anti join), i.e. the reference's add-docs verb (A6)
    runs continuously."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def process_batch(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        coll._append_df(batch_df)
        if embed:
            for col in coll.config.index_columns:
                coll.embed_column(col, incremental=True)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events_stream,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
):
    """Tumbling-window counts + sums with late-data watermark.

    Batch twin: q_events_time_rollup's hour tier (date_trunc == tumbling
    window start for aligned windows), which is oracle-checked."""
    events_stream, was_ntz = ensure_event_time(events_stream, ts_col)
    start = F.col("w.start")
    if was_ntz:
        start = start.cast("timestamp_ntz")
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            start.alias("window_start"),
            key_col,
            "n",
            "sum_value",
        )
    )
