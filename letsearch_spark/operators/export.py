"""Training-dataset egress: exact global order -> size-bounded shards
-> manifest. The LAST step of the data factory (reference scope ends at
serving; a training pipeline additionally has to hand the curated
corpus to a trainer as enumerable, checksummed shards in a declared
order -- what WebDataset/MDS-style loaders consume).

Spark-first shapes:

- :func:`prefix_sum` -- exact running total under a global order with
  NO single-partition window: ONE range shuffle on the order columns,
  per-partition SUMS (<= numPartitions rows) collected for prefix
  offsets, then an intra-partition running-sum window. The same
  geometry as operators/curriculum.distributed_rank, generalized from
  COUNT to SUM -- at 100 TB the driver still only ever sees P numbers.
- :func:`assign_shards` -- shard id per row, by row count
  (``rows_per_shard``) or by an exact token budget
  (``tokens_per_shard``: greedy fill in rank order off the prefix sum,
  the bin layout a loader wants when documents vary 100x in length).
- :func:`export_training_shards` -- write the shards as
  ``shard=N`` parquet partitions (each shard's rows sorted by rank)
  plus a manifest with per-shard row/token counts, rank ranges, and an
  order-invariant content checksum -- the release artifact a trainer
  (or an auditor) verifies before a run.

The manifest checksum is the XOR fold of a 60-bit md5 per row (same
construction as the dedup star-contraction signature): order-invariant,
overflow-free, and any single-row change flips it with probability
1 - 2^-60.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from letsearch_spark.operators.curriculum import distributed_rank


def prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cumsum",
    ascending: bool = True,
    num_partitions: int | None = None,
    pin: str = "local",
    rank_col: str | None = None,
) -> DataFrame:
    """Exact INCLUSIVE running sum of ``value_col`` under the global
    order ``order_cols`` (which must form a total order -- include a
    unique tiebreak column last), without moving all rows to one
    partition. ``rank_col``: optionally also emit the exact 1-based
    global rank -- FREE in the same pass (the count offsets ride the
    same <= numPartitions-row collect as the sum offsets).

    Geometry: ``repartitionByRange`` on the order columns, collect the
    per-partition (sum, count) pairs (<= numPartitions rows -- never
    data), turn them into prefix offsets, add intra-partition
    running-sum / row_number windows over the already-sorted runs.
    ``pin`` as in :func:`distributed_rank` ('local' localCheckpoint,
    'reliable' checkpoint) -- the range boundaries are sampled, so the
    result must be pinned before the staging cache is released.
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
        stats = {
            r["_pid"]: (r["s"], r["n"])
            for r in ranged.groupBy("_pid")
            .agg(
                F.sum(F.col(value_col)).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        }
        sum_offsets, cnt_offsets = {}, {}
        s_acc = n_acc = 0
        for pid in sorted(stats):
            sum_offsets[pid], cnt_offsets[pid] = s_acc, n_acc
            s_acc += stats[pid][0] or 0
            n_acc += stats[pid][1]

        def _offset_expr(offsets):
            if not offsets:
                return F.lit(0)
            mapping = F.create_map(
                *[F.lit(x) for kv in offsets.items() for x in kv]
            )
            return mapping[F.col("_pid")]

        w = Window.partitionBy("_pid").orderBy(*keys)
        running = F.sum(F.col(value_col)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = ranged.withColumn(
            out_col, (_offset_expr(sum_offsets) + running).cast("long")
        )
        if rank_col is not None:
            out = out.withColumn(
                rank_col,
                (_offset_expr(cnt_offsets) + F.row_number().over(w)).cast(
                    "long"
                ),
            )
        out = out.drop("_pid")
        if pin == "reliable":
            out = out.checkpoint(eager=True)
        else:
            out = out.localCheckpoint(eager=True)
        return out
    finally:
        ranged.unpersist()


def assign_shards(
    df: DataFrame,
    order_cols: list[str],
    rows_per_shard: int | None = None,
    tokens_per_shard: int | None = None,
    token_col: str | None = None,
    ascending: bool = True,
    rank_col: str = "rank",
    shard_col: str = "shard",
    num_partitions: int | None = None,
    pin: str = "local",
) -> DataFrame:
    """Rows + exact global ``rank_col`` + 0-based ``shard_col`` under
    the declared order. Exactly one of:

    - ``rows_per_shard``: shard = (rank-1) / rows_per_shard -- equal
      row counts, the layout for uniform records;
    - ``tokens_per_shard`` (+ ``token_col``): greedy fill in rank
      order -- shard = exclusive-prefix-tokens / tokens_per_shard, so
      every shard holds consecutive-rank documents and is the FIRST
      shard whose budget the document's starting offset falls into.
      Documents longer than the budget still land deterministically
      (they overflow their shard; a loader that must cap sequence
      length packs/splits downstream -- operators/pack.py).

    Both modes are one range shuffle (the rank/prefix machinery);
    negative or null token counts are rejected loudly rather than
    silently corrupting offsets.
    """
    if (rows_per_shard is None) == (tokens_per_shard is None):
        raise ValueError(
            "pass exactly one of rows_per_shard / tokens_per_shard"
        )
    if rows_per_shard is not None:
        if rows_per_shard <= 0:
            raise ValueError(f"rows_per_shard must be > 0, got {rows_per_shard}")
        ranked = distributed_rank(
            df,
            order_cols,
            ascending=ascending,
            rank_col=rank_col,
            num_partitions=num_partitions,
            pin=pin,
        )
        return ranked.withColumn(
            shard_col,
            F.floor((F.col(rank_col) - 1) / rows_per_shard).cast("long"),
        )
    if tokens_per_shard <= 0:
        raise ValueError(f"tokens_per_shard must be > 0, got {tokens_per_shard}")
    if token_col is None:
        raise ValueError("tokens_per_shard needs token_col")
    bad = df.where(
        F.col(token_col).isNull() | (F.col(token_col) < 0)
    ).limit(1).count()
    if bad:
        raise ValueError(
            f"{token_col} holds null/negative values; token-budget "
            f"sharding needs complete non-negative counts"
        )
    # ONE range shuffle computes both the inclusive prefix sum and the
    # rank (the count offsets ride the same per-partition collect)
    summed = prefix_sum(
        df,
        order_cols,
        token_col,
        out_col="_cum",
        ascending=ascending,
        num_partitions=num_partitions,
        pin=pin,
        rank_col=rank_col,
    )
    return summed.withColumn(
        shard_col,
        F.floor((F.col("_cum") - F.col(token_col)) / tokens_per_shard).cast(
            "long"
        ),
    ).drop("_cum")


def _row_checksum(cols: list[str]):
    """60-bit md5 of the named columns, null-tagged -- XOR-foldable."""
    parts = []
    for c in cols:
        parts.append(
            F.when(F.col(c).isNull(), F.lit("\x00null"))
            .otherwise(F.col(c).cast("string"))
        )
    return F.conv(
        F.substring(F.md5(F.concat_ws("\x01", *parts)), 1, 15), 16, 10
    ).cast("long")


def shard_manifest(
    assigned: DataFrame,
    shard_col: str = "shard",
    rank_col: str = "rank",
    token_col: str | None = None,
    checksum_cols: list[str] | None = None,
) -> DataFrame:
    """Per-shard release manifest: (shard, n_rows, first_rank,
    last_rank, [n_tokens,] checksum) -- ONE partial-aggregable groupBy.
    ``checksum`` is the order-invariant XOR fold of a 60-bit md5 over
    ``checksum_cols`` (default: the rank column -- pass the content
    columns for an end-to-end integrity manifest)."""
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.min(rank_col).alias("first_rank"),
        F.max(rank_col).alias("last_rank"),
    ]
    if token_col is not None:
        aggs.append(F.sum(token_col).cast("long").alias("n_tokens"))
    aggs.append(
        F.bit_xor(_row_checksum(checksum_cols or [rank_col])).alias("checksum")
    )
    return assigned.groupBy(shard_col).agg(*aggs).orderBy(shard_col)


def export_training_shards(
    df: DataFrame,
    path: str,
    order_cols: list[str],
    rows_per_shard: int | None = None,
    tokens_per_shard: int | None = None,
    token_col: str | None = None,
    checksum_cols: list[str] | None = None,
    ascending: bool = True,
    pin: str = "local",
    data_format: str = "parquet",
) -> DataFrame:
    """Write the corpus as ``shard=N/`` partitions under ``path``
    (each shard's rows rank-sorted, so a sequential reader streams the
    declared order) and a ``_manifest`` parquet beside them; returns
    the manifest DataFrame.

    ``data_format`` (r10): 'parquet' (default) or 'jsonl' -- the
    de-facto trainer interchange format (one JSON object per line,
    same shard=N/ layout, same manifest/verify contract; the manifest
    itself stays parquet, it is metadata). JSONL round-trips integer
    and string columns exactly; schema inference on re-read is the
    caller's caveat for exotic types -- verify_training_shards uses
    the same checksum string-cast on both sides, so a type that
    round-trips its string form verifies.

    Scale shape: the shard assignment is the one range shuffle of the
    rank machinery; the write range-partitions on (shard, rank), so a
    shard is one (occasionally two, at range boundaries) files and the
    egress never funnels through a single task. The manifest is a
    partial-aggregable groupBy over (shard) -- P rows to the driver,
    never data.
    """
    if data_format not in ("parquet", "jsonl"):
        raise ValueError(
            f"data_format must be 'parquet' or 'jsonl', got {data_format!r}"
        )
    assigned = assign_shards(
        df,
        order_cols,
        rows_per_shard=rows_per_shard,
        tokens_per_shard=tokens_per_shard,
        token_col=token_col,
        ascending=ascending,
        pin=pin,
    )
    n_shards = assigned.agg(F.max("shard")).first()[0]
    n_shards = int(n_shards or 0) + 1
    writer = (
        assigned.repartitionByRange(n_shards, F.col("shard"), F.col("rank"))
        .sortWithinPartitions("shard", "rank")
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if data_format == "jsonl":
        writer.json(path)
    else:
        writer.parquet(path)
    manifest = shard_manifest(
        assigned,
        token_col=token_col,
        checksum_cols=checksum_cols,
    )
    manifest.write.mode("overwrite").parquet(path.rstrip("/") + "_manifest")
    return manifest


def verify_training_shards(
    spark,
    path: str,
    token_col: str | None = None,
    checksum_cols: list[str] | None = None,
    strict: bool = True,
    data_format: str = "parquet",
):
    """Re-read an :func:`export_training_shards` layout and verify it
    against its ``_manifest``: per shard, recompute (n_rows, rank
    range, [n_tokens,] checksum) from the data files and compare --
    the trainer-side integrity gate before a run (a truncated upload,
    a lost shard directory, or a post-export edit all flip it).

    Pass the SAME ``token_col``/``checksum_cols`` the export used. One
    partial-aggregable groupBy over the shard data + a tiny manifest
    join; returns the per-shard comparison DataFrame (shard, ok,
    expected vs actual columns). ``strict=True`` raises on any
    mismatch, missing shard, or extra shard.
    """
    if data_format not in ("parquet", "jsonl"):
        raise ValueError(
            f"data_format must be 'parquet' or 'jsonl', got {data_format!r}"
        )
    data = (
        spark.read.json(path)
        if data_format == "jsonl"
        else spark.read.parquet(path)
    )
    actual = shard_manifest(
        data, token_col=token_col, checksum_cols=checksum_cols
    )
    expected = spark.read.parquet(path.rstrip("/") + "_manifest")
    cmp_cols = [c for c in actual.columns if c != "shard"]
    a = actual.select(
        "shard", *[F.col(c).alias(f"actual_{c}") for c in cmp_cols]
    )
    e = expected.select(
        "shard", *[F.col(c).alias(f"expected_{c}") for c in cmp_cols]
    )
    ok = F.lit(True)
    for c in cmp_cols:
        ok = ok & F.col(f"actual_{c}").eqNullSafe(F.col(f"expected_{c}"))
    report = (
        e.join(a, "shard", "full_outer")
        .withColumn(
            "ok",
            ok
            & F.col(f"actual_{cmp_cols[0]}").isNotNull()
            & F.col(f"expected_{cmp_cols[0]}").isNotNull(),
        )
        .orderBy("shard")
    )
    if strict:
        bad = report.where(~F.col("ok")).limit(5).collect()
        if bad:
            raise RuntimeError(
                f"shard verification failed for {len(bad)}+ shard(s) "
                f"under {path}: first mismatches "
                f"{[(r['shard']) for r in bad]} -- the data does not "
                f"match its manifest (truncated/edited/missing shards?)"
            )
    return report
