"""Curriculum ordering via exact distributed ranking.

Training curricula (short->long, clean->noisy, easy->hard) need every
document's exact global position under a total order -- but the naive
``row_number() OVER (ORDER BY score)`` collapses to a SINGLE partition
in Spark (empty ``partitionBy``), the classic scale-killer this repo
bans elsewhere (see VERDICT r4 "oracle-only global windows").

``distributed_rank`` computes the same rank scalably, the way
``zipWithIndex`` does but staying in the DataFrame API:

1. ``repartitionByRange`` on the order key -- non-overlapping sorted
   ranges across P partitions (the range sampler only affects partition
   BOUNDARIES, never the result: rank is a function of the total order);
2. ``sortWithinPartitions`` + ``row_number`` partitioned by
   ``spark_partition_id()`` -- a window WITHIN each partition, no extra
   shuffle;
3. per-partition counts -> driver prefix sum (P integers, not rows) ->
   broadcast-joined offsets; rank = offset + local row_number.

The tiebreak column makes the order total, so the rank is deterministic
and engine-reproducible -- the DuckDB oracle replays it with a plain
``row_number() OVER (ORDER BY ...)``.

``curriculum_shards`` layers contiguous equal-ish shard assignment on
top (SQL NTILE semantics: first ``n % k`` shards get the extra row), so
a training loader can stream shard 1..k in curriculum order.

No reference analog (SURVEY.md §2.7 north-star family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def distributed_rank(
    df: DataFrame,
    order_cols: list[str],
    ascending: bool = True,
    rank_col: str = "rank",
    num_partitions: int | None = None,
    pin: str = "local",
) -> DataFrame:
    """Exact 1-based global rank under ``ORDER BY order_cols`` without a
    single-partition window. ``order_cols`` must form a total order
    (include a unique tiebreak column last) for a deterministic result.

    The result must be PINNED before this function releases the ranged
    cache: ``repartitionByRange`` samples partition boundaries, so a
    lineage recomputation could assign different ``_pid``s than the
    collected counts and corrupt ranks. ``pin`` picks how:

    - ``'local'`` (default): ``localCheckpoint(eager=True)`` -- fast, but
      checkpoint blocks live only on executors; an executor loss after
      this call makes the result unrecoverable mid-job. Right for
      short-lived jobs and local mode.
    - ``'reliable'``: ``checkpoint(eager=True)`` to the reliable
      checkpoint directory (``spark.sparkContext.setCheckpointDir`` --
      HDFS/S3 on a cluster). Survives executor loss; the right choice for
      long-running 100 TB jobs. Raises a clear error when no checkpoint
      dir is configured.
    """
    if not order_cols:
        raise ValueError("order_cols must name at least one column")
    if pin not in ("local", "reliable"):
        raise ValueError(f"pin must be 'local' or 'reliable', got {pin!r}")
    if pin == "reliable" and df.sparkSession.sparkContext.getCheckpointDir() is None:
        raise ValueError(
            "pin='reliable' needs a checkpoint directory: call "
            "spark.sparkContext.setCheckpointDir(<HDFS/S3 path>) first"
        )
    p = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    keys = [
        F.col(c).asc() if ascending else F.col(c).desc() for c in order_cols
    ]
    ranged = (
        df.repartitionByRange(p, *keys)
        .sortWithinPartitions(*keys)
        .withColumn("_pid", F.spark_partition_id())
    )
    ranged = ranged.persist()
    try:
        # P rows to the driver -- partition COUNTS, never data
        counts = {
            r["_pid"]: r["n"]
            for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        offsets, acc = {}, 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        offset_expr = F.lit(0)
        if offsets:
            mapping = F.create_map(
                *[F.lit(x) for kv in offsets.items() for x in kv]
            )
            offset_expr = mapping[F.col("_pid")]
        local = F.row_number().over(
            Window.partitionBy("_pid").orderBy(*keys)
        )
        out = ranged.withColumn(
            rank_col, (offset_expr + local).cast("long")
        ).drop("_pid")
        # materialize before releasing the ranged cache the plan reads
        # (see the ``pin`` docstring for why this is mandatory)
        if pin == "reliable":
            out = out.checkpoint(eager=True)
        else:
            out = out.localCheckpoint(eager=True)
        return out
    finally:
        ranged.unpersist()


def shuffle_order(
    df: DataFrame,
    id_col: str,
    seed: int = 42,
    rank_col: str = "shuffle_rank",
    num_partitions: int | None = None,
    pin: str = "local",
) -> DataFrame:
    """Deterministic global RANDOM order -- the counterpart of the
    curriculum rank for plain training epochs: every row gets its exact
    1-based position under a seeded pseudo-random permutation, so a
    loader reading rank order streams the corpus in a shuffled but
    REPRODUCIBLE sequence, and ``seed=epoch`` gives independent
    per-epoch permutations without materializing anything new.

    The permutation key is ``md5(id || '#seed')`` -- the same
    cross-engine hash family ``hash_split``/``hash_sample`` use
    (operators/sample.py), so a DuckDB oracle replays the exact order
    with a plain ``ORDER BY md5(...)``. Ranking goes through
    :func:`distributed_rank` (ONE range shuffle of (id, 44-byte hash)
    pairs, no single-partition window); ``id_col`` breaks the
    (astronomically unlikely) hash ties to keep the order total.
    """
    keyed = df.withColumn(
        "__sk",
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}"))),
    )
    return distributed_rank(
        keyed,
        ["__sk", id_col],
        ascending=True,
        rank_col=rank_col,
        num_partitions=num_partitions,
        pin=pin,
    ).drop("__sk")


def ntile_of_rank(rank, n: int, num_tiles: int):
    """SQL NTILE bucket for a 1-based ``rank`` among ``n`` rows: the
    first ``n % num_tiles`` buckets hold ``n // num_tiles + 1`` rows.
    Column-expression form shared by operator and oracle."""
    q, r = divmod(n, num_tiles)
    if q == 0:
        return rank.cast("int")
    big = F.lit((q + 1) * r)
    return (
        F.when(rank <= big, (rank - 1) / (q + 1))
        .otherwise(F.lit(r) + (rank - 1 - big) / q)
        .cast("int")
        + 1
    )


def curriculum_shards(
    df: DataFrame,
    score_col: str,
    id_col: str,
    num_shards: int,
    ascending: bool = True,
    shard_col: str = "shard",
    rank_col: str = "rank",
    num_partitions: int | None = None,
    pin: str = "local",
) -> DataFrame:
    """Assign each row a curriculum ``rank`` (exact global position by
    ``score_col`` then ``id_col``) and a contiguous ``shard`` in
    [1, num_shards] with NTILE size semantics. A loader that reads shard
    1, 2, ... k consumes the corpus in curriculum order; within a shard,
    rank gives the exact sequence."""
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    ranked = distributed_rank(
        df,
        [score_col, id_col],
        ascending=ascending,
        rank_col=rank_col,
        num_partitions=num_partitions,
        pin=pin,
    )
    n = ranked.count()
    if n == 0:
        return ranked.withColumn(shard_col, F.lit(None).cast("int"))
    return ranked.withColumn(
        shard_col, ntile_of_rank(F.col(rank_col), n, num_shards)
    )


def interleave_order(
    df: DataFrame,
    source_col: str,
    order_cols: list[str],
    rank_col: str = "interleave_rank",
    num_partitions: int | None = None,
    pin: str = "local",
) -> DataFrame:
    """Exact ROUND-ROBIN global order across sources: position 1..n
    such that a sequential reader alternates ``source_col`` values for
    as long as every source still has rows (round 1 holds each source's
    first row, round 2 the seconds, ...; within a round, sources read
    in their natural order). The deterministic alternative to
    :func:`shuffle_order` when the goal is specifically "no long
    single-domain runs" in the training stream -- mixture sampling
    decides HOW MUCH of each source, this decides the ADJACENCY.

    ``order_cols`` orders rows WITHIN a source (include a unique
    tiebreak last). Shape: the within-source round number is a
    :func:`distributed_rank` over ``(source, order_cols)`` minus a
    per-source offset (prefix sums of a ``groupBy(source).count()`` --
    |sources| rows, broadcast back). A ``Window.partitionBy(source)``
    would put each source's ENTIRE row set through one task (with the
    typical 3-20 training sources that is corpus/|sources| rows per
    task at egress scale -- VERDICT r7 #4); the range-shuffled rank
    spreads every source across all partitions. A second
    ``distributed_rank`` on (round, source) then gives the exact global
    position. Two range shuffles total, no fat window.
    """
    if not order_cols:
        raise ValueError("order_cols must name at least one column")
    rounds = _interleave_rounds(
        df, source_col, order_cols, num_partitions=num_partitions, pin=pin
    )
    out = distributed_rank(
        rounds,
        ["_round", source_col],
        rank_col=rank_col,
        num_partitions=num_partitions,
        pin=pin,
    )
    return out.drop("_round")


def _interleave_rounds(
    df: DataFrame,
    source_col: str,
    order_cols: list[str],
    num_partitions: int | None = None,
    pin: str = "local",
) -> DataFrame:
    """Within-source 1-based round number without a per-source window:
    global rank over (source, order_cols) minus each source's prefix-sum
    offset. Exposed separately so the plan gate can assert the shape
    (tests/test_curriculum.py): a broadcast join + a window over the
    |sources|-row count aggregate, never a row_number partitioned by
    source."""
    ranked = distributed_rank(
        df,
        [source_col] + list(order_cols),
        rank_col="_gpos",
        num_partitions=num_partitions,
        pin=pin,
    )
    counts = ranked.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    # prefix-sum window over |sources| rows (tiny aggregate, never data)
    # keeps the offset order identical to Spark's own sort of source_col
    woff = Window.orderBy(F.col(source_col).asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        F.col(source_col).alias("__osrc"),
        F.coalesce(F.sum("_n").over(woff), F.lit(0))
        .cast("long")
        .alias("_off"),
    )
    # null-safe: a NULL source is a legitimate group (the old window
    # kept it; a plain equi-join would silently drop those rows)
    return (
        ranked.join(
            F.broadcast(offsets),
            F.col(source_col).eqNullSafe(F.col("__osrc")),
        )
        .withColumn("_round", F.col("_gpos") - F.col("_off"))
        .drop("_gpos", "_off", "__osrc")
    )
