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


def stream_prep_collection(
    spark,
    coll,
    source_dir: str,
    schema,
    checkpoint_dir: str,
    state_dir: str,
    text_col: str = "text",
    quality: dict | None = None,
    dedup: dict | None = None,
    max_files_per_trigger: int = 10,
    embed: bool = True,
):
    """Streaming ingest with the prep pipeline's front stages: each
    micro-batch is quality-filtered (functions/text.py gopher_flags),
    near-dup-deduplicated against EVERYTHING previously seen
    (operators/dedup.py incremental_minhash_dedup over a persisted
    signature store), and only then appended + incrementally embedded
    -- `prepare_training_data`'s stages 1+3 running continuously in
    front of the reference's add-docs verb.

    ``state_dir`` holds the dedup memory between micro-batches (and
    restarts): ``bands/`` (the signature store) and ``corpus/`` (every
    PROCESSED document with its provisional id -- kept or dropped,
    because first-seen-wins must verify future candidates against
    dropped docs too; duplicate-of-a-duplicate is not transitive at a
    fixed threshold). Provisional ids continue from the archive's max,
    so they are unique across history; collection keys are assigned
    only to KEPT rows by the normal append path.

    ``quality``/``dedup``: None disables the stage; a dict forwards
    kwargs (gopher_flags / incremental_minhash_dedup). Exactly-once per
    micro-batch comes from the checkpoint; the state writes are atomic
    only per completed batch (same single-writer contract as the append
    path) -- a crash mid-batch can leave archived-but-unappended rows
    whose re-run is then flagged duplicate against the orphans; recover
    by trimming ``corpus/``/``bands/`` above the collection's max key
    before restarting. Write order inside a batch is load-bearing: the
    keyed batch is archived to ``corpus/`` FIRST and read back
    (positional id assignment is only stable within one
    materialization, and foreachBatch re-plans the micro-batch source
    per action -- the parquet round-trip pins each row's provisional
    id), while the batch's ``bands`` are appended LAST (the store is a
    lazy scan of ``bands/`` that the keep plan reads; appending before
    it executes would re-list the directory and pair every document
    with itself). Returns the StreamingQuery.

    At 100 TB-ingest scale each batch costs: one Catalyst scan for the
    quality flags, one signature pass over the batch + a banded join
    against the store (history is never re-shingled wholesale -- cost
    tracks the batch, SCALING.md's incr_minhash probe), and the
    append/embed of survivors.
    """
    import os

    from letsearch_spark.keys import add_dense_key
    from letsearch_spark.operators.dedup import incremental_minhash_dedup

    bands_path = os.path.join(state_dir, "bands")
    corpus_path = os.path.join(state_dir, "corpus")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def process_batch(batch_df, batch_id: int):
        cur = batch_df
        if quality is not None:
            from letsearch_spark.functions.text import gopher_flags

            cur = cur.where(gopher_flags(F.col(text_col), **quality)["passes"])
        if dedup is not None:
            try:
                store = spark.read.parquet(bands_path)
                corpus = spark.read.parquet(corpus_path)
            except Exception:  # first batch: no state yet
                store, corpus = None, None
            start = 1
            if corpus is not None:
                start = int(
                    corpus.agg(F.max("__prep_id")).first()[0] or 0
                ) + 1
            # archive the keyed batch FIRST and read it back: positional
            # id assignment is only stable within one materialization,
            # and inside foreachBatch the micro-batch source re-evaluates
            # per action -- the parquet round-trip pins each row's
            # provisional id before any plan branches on it
            add_dense_key(
                cur, "__prep_id", start=start, if_absent=False
            ).write.mode("append").parquet(corpus_path)
            archive = spark.read.parquet(corpus_path)
            keyed = archive.where(F.col("__prep_id") >= start)
            if corpus is not None:
                # re-derive history from the same post-write listing so
                # the lazily-read pre-write frame can't drift
                corpus = archive.where(F.col("__prep_id") < start)
            res = incremental_minhash_dedup(
                keyed, store, corpus, "__prep_id", text_col, **dedup
            )
            kept_ids = res["keep"].where("keep").select("__prep_id")
            kept = keyed.join(kept_ids, "__prep_id")
            cur = kept.drop("__prep_id")
        if not cur.isEmpty():
            coll._append_df(cur)
        if dedup is not None:
            # bands LAST: ``store`` is a lazy scan of bands_path, and the
            # keep/kept plans read it -- appending this batch's bands
            # before they execute would re-list the directory and pair
            # every batch document with itself
            res["bands"].write.mode("append").parquet(bands_path)
            res["release"]()
        if embed:
            for col in coll.config.index_columns:
                coll.embed_column(col, incremental=True)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
