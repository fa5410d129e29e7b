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
