"""applyInPandasWithState session windows vs the batch sessionizer.

The stream emits CLOSED sessions only; the batch twin computes every
session. The check: every emitted session must exactly match a batch
session (same user, start, end, count), and the stream must emit all
sessions that closed well before the final watermark.
"""

import os

from pyspark.sql import Window
from pyspark.sql import functions as F


def batch_sessions(ev, gap_seconds=1800):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_s = F.when(
        prev.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev)) > gap_seconds),
        1,
    ).otherwise(0)
    sessions = (
        ev.withColumn("new_s", new_s)
        .withColumn(
            "session_id", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return sessions.select("user_id", "session_start", "session_end", "n_events")


def test_stateful_sessions_match_batch(spark, sf_dir, tmp_path):
    from letsearch_spark.queries import load
    from letsearch_spark.streaming.stateful import session_windows

    ev = load(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    ev.write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = session_windows(stream, gap_seconds=1800, watermark="2 hours")
    sink = str(tmp_path / "sink")
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(sink).collect()
    }
    expected = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch_sessions(ev).collect()
    }
    assert got, "stream emitted no closed sessions"
    # soundness: every emitted session is a true batch session
    assert got <= expected, f"spurious sessions: {list(got - expected)[:3]}"
    # completeness (modulo watermark): sessions ending >4h before the max
    # event time must all have been closed and emitted
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts.timestamp() - 4 * 3600
    must_emit = {s for s in expected if s[2].timestamp() < cutoff}
    missing = must_emit - got
    assert not missing, f"missing closed sessions: {list(missing)[:3]}"


def test_streaming_dedup_flags_duplicates_across_batches(spark, tmp_path):
    """Online dedup state: re-ingesting the same content in a LATER
    micro-batch must flag it as a duplicate (first_seen=False), which
    per-batch dropDuplicates cannot do. Verified against the batch
    exact_dedup keep-list on the union of both batches."""
    from letsearch_spark.operators.dedup import exact_dedup
    from letsearch_spark.streaming.stateful import streaming_dedup

    src = str(tmp_path / "src")
    batch1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "Alpha  beta")],
        "_key long, text string",
    )
    batch2 = spark.createDataFrame(
        [(4, "alpha beta"), (5, "epsilon"), (6, "gamma delta")],
        "_key long, text string",
    )
    # two parquet files -> two micro-batches (maxFilesPerTrigger=1)
    batch1.coalesce(1).write.mode("append").parquet(src)
    batch2.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(batch1.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = streaming_dedup(stream)
    sink = str(tmp_path / "sink")
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {r["doc_key"]: r["first_seen"] for r in spark.read.parquet(sink).collect()}
    assert len(got) == 6  # verdict column, no rows dropped
    # batch twin: keep-list of the union
    union = batch1.union(batch2)
    keep = {
        r["keep_id"] for r in exact_dedup(union, "_key", "text").collect()
    }
    assert {k for k, first in got.items() if first} == keep
    # the cross-batch duplicate (key 4 repeats key 1's content; 3 is a
    # whitespace/case variant of 1; 6 repeats 2) is the point
    assert got[1] and got[2] and got[5]
    assert not got[3] and not got[4] and not got[6]


def test_foreachbatch_incremental_minhash_dedup(spark, tmp_path):
    """incremental_minhash_dedup driven by an actual foreachBatch
    stream: the signature store and corpus archive persist as parquet
    between micro-batches, so a NEAR-duplicate (not just exact) arriving
    in a later batch is flagged against history -- the claim the
    operator's docstring makes about its streaming shape."""
    import os

    from letsearch_spark.operators.dedup import incremental_minhash_dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota NU"  # 1 word off
    batch1 = spark.createDataFrame(
        [(1, base), (2, "totally unrelated content lives in this row")],
        "_key long, text string",
    )
    batch2 = spark.createDataFrame(
        [(3, near), (4, "another fresh and unique document body here")],
        "_key long, text string",
    )
    src = str(tmp_path / "src")
    batch1.coalesce(1).write.mode("append").parquet(src)
    batch2.coalesce(1).write.mode("append").parquet(src)

    store_path = str(tmp_path / "store")
    corpus_path = str(tmp_path / "corpus")
    keep_path = str(tmp_path / "keep")

    def process(batch_df, batch_id):
        s = spark.read.parquet(store_path) if os.path.exists(store_path) else None
        c = spark.read.parquet(corpus_path) if os.path.exists(corpus_path) else None
        res = incremental_minhash_dedup(
            batch_df, s, c, "_key", "text", threshold=0.5
        )
        res["keep"].write.mode("append").parquet(keep_path)
        res["bands"].write.mode("append").parquet(store_path)
        batch_df.write.mode("append").parquet(corpus_path)
        res["release"]()

    stream = spark.readStream.schema(batch1.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)

    got = {
        r["_key"]: (r["keep"], r["dup_of"])
        for r in spark.read.parquet(keep_path).collect()
    }
    assert got[1] == (True, None) and got[2] == (True, None)
    assert got[3] == (False, 1)  # near-dup caught ACROSS micro-batches
    assert got[4] == (True, None)
    # store accumulated bands for every processed doc (4 docs x 8 bands)
    assert spark.read.parquet(store_path).count() == 32
