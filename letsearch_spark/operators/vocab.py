"""Corpus vocabulary analytics: the coverage curve behind vocab-size
decisions.

Choosing a tokenizer vocab size (or a word-level truncation) needs the
classic Zipf diagnostic: what fraction of all token OCCURRENCES do the
top-k most frequent types cover? ``vocab_coverage`` computes the curve
for a list of k cut-offs.

Scale shape: one explode+groupBy shuffle produces the type-frequency
table (map-side combine keeps the shuffle narrow -- one row per type per
partition); ranking the types by frequency uses
:func:`letsearch_spark.operators.curriculum.distributed_rank` (range
partitions + offsets), because at web scale the type table itself is
hundreds of millions of rows and a single-partition ``row_number``
window would serialize it. The k cut-offs become one conditional
aggregation over the ranked types (``count/sum(CASE WHEN rank <= k)``
per cut-off, unpivoted with ``stack``) -- no join of any kind, a single
pass over the type table.

No reference analog (SURVEY.md §2.7 north-star family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from letsearch_spark.operators.curriculum import distributed_rank
from letsearch_spark.operators.dedup import words_of


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(w, cnt) type-frequency table over whitespace words of the
    trimmed, lower-cased text. One shuffle."""
    return (
        df.select(F.explode(words_of(F.col(text_col))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str,
    ks: tuple[int, ...] = (100, 1000, 10000),
    num_partitions: int | None = None,
) -> DataFrame:
    """Coverage curve: for each cut-off k, the number of types kept
    (``vocab_k``), token occurrences covered, corpus total, and the
    covered share rounded to 6.

    Types are ranked by frequency descending with the word as the
    deterministic tiebreak (rank 1 = most frequent), so the curve is
    engine-reproducible."""
    if not ks or any(k < 1 for k in ks):
        raise ValueError(f"ks must be positive cut-offs, got {ks!r}")
    counts = word_frequencies(df, text_col)
    # rank by freq desc / word asc == (-freq, word) asc
    ranked = distributed_rank(
        counts.withColumn("_neg", -F.col("cnt")),
        ["_neg", "w"],
        num_partitions=num_partitions,
    ).drop("_neg")
    cuts = sorted(set(int(k) for k in ks))
    aggs = [F.sum("cnt").alias("_total")]
    for i, k in enumerate(cuts):
        within = F.col("rank") <= k
        aggs.append(F.count(F.when(within, 1)).alias(f"_v{i}"))
        aggs.append(F.sum(F.when(within, F.col("cnt"))).alias(f"_c{i}"))
    one = ranked.agg(*aggs)
    stack_args = ", ".join(
        f"bigint({k}), _v{i}, _c{i}" for i, k in enumerate(cuts)
    )
    return (
        one.select(
            F.expr(
                f"stack({len(cuts)}, {stack_args}) AS "
                "(k, vocab_k, covered_tokens)"
            ),
            F.col("_total").alias("total_tokens"),
        )
        .where(F.col("total_tokens") > 0)
        .withColumn(
            "coverage",
            F.round(F.col("covered_tokens") * 1.0 / F.col("total_tokens"), 6),
        )
        .select("k", "vocab_k", "covered_tokens", "total_tokens", "coverage")
        .orderBy("k")
    )


def tokenizer_fertility(
    docs: DataFrame,
    counts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_col: str = "n_tokens",
) -> DataFrame:
    """Corpus-level tokenizer quality numbers (r9) from ANY per-doc
    token-count table -- the sibling diagnostic to
    :func:`vocab_coverage` for comparing trained tokenizers
    (word-BPE / unigram / byte-BPE) at a vocab budget:

    * **fertility** = tokens per whitespace word (lower is better; the
      SentencePiece/GPT-2 papers' headline number);
    * **bytes per token** = UTF-8 corpus bytes / tokens (the context-
      window budget a trainer actually pays);
    * **chars per token** -- the unicode-friendly variant.

    No join at all (r9 review catch: the first cut inner-joined two
    corpus-sized tables just to sum them, and silently dropped docs
    missing from ``counts``): the docs scan and the counts table
    aggregate INDEPENDENTLY to one row each, crossJoined at size 1x1.
    The caller owns the contract that ``counts`` covers the same
    corpus (token_count_exact / _unigram / _bytebpe over ``docs`` --
    all oracle-checked, which is why this diagnostic carries no oracle
    entry of its own).

    Ratios are exact integer micro-units computed in decimal(38)
    (n * 1e6 stays exact far past the int64 wrap a 100 TB corpus would
    hit at ~9.2e12 bytes, and decimal division is exact where a
    double path drifts past 2^53). Returns ONE row: (n_docs, n_words,
    n_bytes, n_chars, n_tokens, fertility_micro,
    bytes_per_token_micro, chars_per_token_micro). Null texts count 0
    words/bytes/chars.
    """
    from letsearch_spark.tokenizer import split_words

    text = F.coalesce(F.col(text_col), F.lit(""))
    zero = F.lit(0).cast("long")
    doc_agg = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(
            F.sum(F.size(split_words(text)).cast("long")), zero
        ).alias("n_words"),
        F.coalesce(
            F.sum(F.octet_length(text).cast("long")), zero
        ).alias("n_bytes"),
        F.coalesce(F.sum(F.length(text).cast("long")), zero).alias(
            "n_chars"
        ),
    )
    # coalesce (r9 third-review catch): sum over zero rows is NULL,
    # which leaked a mixed NULL/0 result row for empty counts tables
    tok_agg = counts.agg(
        F.coalesce(F.sum(F.col(count_col).cast("long")), zero).alias(
            "n_tokens"
        )
    )

    def _micro(num, den):
        # exact integer micro-ratio in decimal(38,0): numerator * 1e6
        # never wraps (decimal range ~1e38). Spark decimal DIVISION
        # rounds HALF_UP at scale 6, so floor(a/b) can land one
        # micro-unit high (r9 third-review catch, empirically
        # confirmed at fraction >= 0.9999995); subtracting the modulo
        # first makes the quotient an exact integer, immune to the
        # rounding
        d38 = "decimal(38,0)"
        a = num.cast(d38) * F.lit(1_000_000).cast(d38)
        b = den.cast(d38)
        return (
            F.when(den > 0, (a - (a % b)) / b)
            .otherwise(F.lit(0))
            .cast("long")
        )

    return doc_agg.crossJoin(tok_agg).select(
        "n_docs",
        "n_words",
        "n_bytes",
        "n_chars",
        "n_tokens",
        _micro(F.col("n_tokens"), F.col("n_words")).alias("fertility_micro"),
        _micro(F.col("n_bytes"), F.col("n_tokens")).alias(
            "bytes_per_token_micro"
        ),
        _micro(F.col("n_chars"), F.col("n_tokens")).alias(
            "chars_per_token_micro"
        ),
    )
