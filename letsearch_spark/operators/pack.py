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


def pack_documents_bins(
    df: DataFrame,
    key_col: str,
    token_count_col: str,
    seq_len: int,
    num_shards: int = 32,
    seed: int = 42,
    on_oversize: str = "error",
) -> DataFrame:
    """Whole-document packing: first-fit-decreasing bins (the SFT shape).

    ``pack_sequences`` implements the pretraining layout (concatenate,
    split at every seq_len, documents cross cuts). Instruction-tuning
    and any loss that must not see two half-documents needs the other
    layout: each document lands WHOLE in exactly one sequence, the
    sequence padded to ``seq_len`` -- and the packer's job is to
    minimize that padding. Best-fit-decreasing gives <= 11/9 OPT + 1
    bins (Johnson 1973, same asymptotic bound as FFD); in practice
    ~1-2% padding where the naive one-doc-per-sequence layout wastes
    50%+. The bin search is a bisect over a sorted capacity index --
    O(n log n) per shard, not the naive first-fit's O(n * bins) scan
    (quadratic exactly when a shard is large, which is the case that
    matters).

    Same scale contract as ``pack_sequences``: ONE shuffle, keyed by
    the same hash shard; the FFD loop runs per shard inside
    ``applyInPandas`` over (key, token_count) pairs only -- text never
    travels, and a shard's layout is a pure function of its members, so
    retries/repartitioning cannot change it. Bins are local to a shard
    (global FFD would serialize the corpus through one node for a ~1%
    efficiency delta; per-shard keeps it embarrassingly parallel --
    with hash-balanced shards the padding penalty vs global is noise).

    ``on_oversize``: documents with tokens > seq_len either ``'error'``
    (default -- almost always an upstream chunking bug), ``'drop'``
    (excluded from the layout), or ``'own_seq'`` (emitted alone in a
    dedicated sequence with tok_len = tokens; downstream truncates --
    the layout stays honest about the real length).

    Returns one row per document with the SAME schema as
    ``pack_sequences`` -- (shard, seq, <key_col>, tok_begin, tok_len,
    seq_offset), ``tok_begin`` always 0 because documents are whole --
    so ``write_training_shards`` / ``write_token_shards`` consume
    either layout unchanged. Within a sequence, documents tile
    [0, sum_of_lens) in insertion order; sum(tok_len) per (shard, seq)
    <= seq_len except ``'own_seq'`` singletons.
    """
    import pandas as pd

    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if num_shards <= 0:
        raise ValueError(f"num_shards must be positive, got {num_shards}")
    if on_oversize not in ("error", "drop", "own_seq"):
        raise ValueError(
            f"on_oversize must be error|drop|own_seq, got {on_oversize!r}"
        )

    key_type = dict(df.dtypes)[key_col]
    tok = F.col(token_count_col).cast("long")
    d = (
        df.select(F.col(key_col), tok.alias("__tok"))
        .where(F.col("__tok") > 0)
        .withColumn(
            "shard",
            (hash_bucket(F.col(key_col), seed=seed) % num_shards).cast("long"),
        )
    )

    schema = (
        f"shard long, seq long, {key_col} {key_type}, "
        "tok_begin long, tok_len long, seq_offset long"
    )
    slen, oversize = seq_len, on_oversize

    def bfd(pdf: pd.DataFrame) -> pd.DataFrame:
        from bisect import bisect_left, insort

        shard = int(pdf["shard"].iloc[0])
        rows = sorted(
            zip(pdf[key_col], pdf["__tok"]), key=lambda r: (-r[1], r[0])
        )
        out_seq, out_key, out_off, out_len = [], [], [], []
        rem: list[int] = []  # remaining capacity per bin index
        # sorted (capacity, bin_idx) index of OPEN bins; best fit = the
        # smallest adequate capacity, ties to the oldest bin -- both
        # resolved by one bisect, so the layout is deterministic
        caps: list[list[int]] = []
        for key, n in rows:
            n = int(n)
            if n > slen:
                if oversize == "error":
                    raise ValueError(
                        f"document {key!r} has {n} tokens > seq_len {slen}; "
                        "chunk upstream or pass on_oversize='drop'/'own_seq'"
                    )
                if oversize == "drop":
                    continue
                out_seq.append(len(rem))
                out_key.append(key)
                out_off.append(0)
                out_len.append(n)
                rem.append(0)  # full: nothing else joins this bin
                continue
            i = bisect_left(caps, [n, -1])
            if i < len(caps):
                _, b = caps.pop(i)
            else:
                b = len(rem)
                rem.append(slen)
            out_seq.append(b)
            out_key.append(key)
            out_off.append(slen - rem[b])
            out_len.append(n)
            rem[b] -= n
            if rem[b] > 0:  # cap-0 bins can't take any further doc
                insort(caps, [rem[b], b])
        return pd.DataFrame(
            {
                "shard": shard,
                "seq": out_seq,
                key_col: out_key,
                "tok_begin": 0,
                "tok_len": out_len,
                "seq_offset": out_off,
            }
        )

    return d.groupBy("shard").applyInPandas(bfd, schema=schema)


def packing_efficiency(
    layout: DataFrame, seq_len: int
) -> DataFrame:
    """Padding audit of a ``pack_documents_bins`` layout: per shard,
    the bin count, token total, and padding fraction
    (1 - tokens / (bins * seq_len)); plus an 'ALL' grand-total row.
    One map-side-combined aggregation -- run it after every pack to
    catch an upstream token-count regression inflating padding."""
    per_seq = layout.groupBy("shard", "seq").agg(
        F.sum("tok_len").alias("__fill")
    )
    per_shard = per_seq.groupBy("shard").agg(
        F.count("*").alias("n_seqs"), F.sum("__fill").alias("n_tokens")
    )
    total = per_shard.agg(
        F.lit(-1).cast("long").alias("shard"),
        F.sum("n_seqs").alias("n_seqs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    both = per_shard.unionByName(total)
    return both.select(
        "shard",
        "n_seqs",
        "n_tokens",
        F.round(
            1.0 - F.col("n_tokens") / (F.col("n_seqs") * F.lit(seq_len)), 6
        ).alias("padding_frac"),
    )
