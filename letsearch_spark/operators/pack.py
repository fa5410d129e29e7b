"""Sequence packing: lay documents out into fixed-length training
sequences (the GPT-style "concatenate then split" packer).

North-star training-data-pipeline operator (SURVEY.md §2.7; not in the
reference -- the reference stops at chunking, chunker.rs:76-299, but a
pretraining pipeline must also decide which tokens land in which
fixed-length sample). Given per-document token counts, the packer
computes the exact (document, sequence, span) layout:

* Documents are assigned to ``num_shards`` shards by key hash -- each
  shard is an independent token stream, so the layout parallelizes and
  a 100 TB corpus packs with ONE shuffle (hash-partition by shard, sort
  by key within). Shards map 1:1 to output files/workers downstream.
* Within a shard, documents are concatenated in key order and the
  stream is cut every ``seq_len`` tokens. A document whose span crosses
  a cut contributes to multiple sequences (the standard pretraining
  layout -- no padding, no token dropped except the final partial
  sequence of each shard, which downstream may pad or drop).

Everything is integer window arithmetic in pure Catalyst -- zero UDFs,
bit-exact in the DuckDB oracle. Determinism: the layout is a pure
function of (key -> tokens) and the knobs; repartitioning and task
retries cannot change it. Appends DO shift offsets within a shard
(the stream grows); re-pack per training run, which is how packing is
used in practice.

Scale notes: the single shuffle carries (key, tokens) only -- text
never travels; the per-shard window sort is bounded by shard size, so
pick ``num_shards`` >= cluster parallelism (default 32; at 100 TB use
O(10k)). The explode emits ceil(tokens/seq_len)+1 rows per doc at most.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from letsearch_spark.operators.sample import hash_bucket


def pack_sequences(
    df: DataFrame,
    key_col: str,
    token_count_col: str,
    seq_len: int,
    num_shards: int = 32,
    seed: int = 42,
    shuffle_seed: int | None = None,
) -> DataFrame:
    """Compute the packed-sequence layout for ``df``.

    Returns one row per (document, sequence) span:

    * ``shard``      -- the document's token stream (hash of key)
    * ``seq``        -- sequence index within the shard (0-based)
    * ``<key_col>``  -- the document key
    * ``tok_begin``  -- first token of the span, within the document
    * ``tok_len``    -- span length in tokens (> 0)
    * ``seq_offset`` -- where the span starts inside the sequence

    Invariants (tested): spans of one document tile [0, tokens) in
    order; spans of one (shard, seq) tile [0, seq_len) except the final
    partial sequence of the shard; sum(tok_len) == sum(tokens).
    Documents with a non-positive token count are dropped.

    ``shuffle_seed`` (optional) concatenates each shard's documents in
    DETERMINISTIC PSEUDO-RANDOM order -- md5(key, shuffle_seed) with
    key as tiebreak -- instead of key order. Pretraining wants
    adjacent-document decorrelation (ingestion order is correlated:
    same crawl, same source, same day); a seeded hash order gives every
    epoch/run a reproducible permutation at ZERO extra cost (same
    single shuffle, the within-shard sort just uses another key), and
    distinct seeds give distinct orders for epoch replicas. None (the
    default) keeps key order.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if num_shards <= 0:
        raise ValueError(f"num_shards must be positive, got {num_shards}")

    tok = F.col(token_count_col).cast("long")
    d = df.select(F.col(key_col), tok.alias("__tok")).where(F.col("__tok") > 0)
    d = d.withColumn(
        "shard", (hash_bucket(F.col(key_col), seed=seed) % num_shards).cast("long")
    )

    # ROWS frame, not the default RANGE: with RANGE, duplicate keys are
    # frame PEERS and would all receive the same stream offset, silently
    # emitting overlapping spans. With ROWS, duplicates still tile the
    # stream (each row gets its own running offset; their relative order
    # is undefined, so layouts are deterministic only for unique keys --
    # which collection keys are).
    order = (
        [F.asc(key_col)]
        if shuffle_seed is None
        else [
            F.asc(hash_bucket(F.col(key_col), seed=shuffle_seed)),
            F.asc(key_col),
        ]
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # stream offset of the document's first token within its shard
    start = (F.sum("__tok").over(w) - F.col("__tok")).alias("__start")
    d = d.withColumn("__start", start)

    first_seq = F.floor(F.col("__start") / seq_len)
    last_seq = F.floor((F.col("__start") + F.col("__tok") - 1) / seq_len)
    d = d.withColumn("seq", F.explode(F.sequence(first_seq, last_seq)))

    seq_start = F.col("seq") * seq_len  # stream offset where this sequence begins
    tok_begin = F.greatest(F.lit(0).cast("long"), seq_start - F.col("__start"))
    tok_end = F.least(F.col("__tok"), seq_start + seq_len - F.col("__start"))
    return d.select(
        "shard",
        F.col("seq").cast("long").alias("seq"),
        key_col,
        tok_begin.alias("tok_begin"),
        (tok_end - tok_begin).alias("tok_len"),
        (F.col("__start") + tok_begin - seq_start).alias("seq_offset"),
    )
