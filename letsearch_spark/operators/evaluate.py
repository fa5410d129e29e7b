"""Retrieval-quality evaluation: recall@k of an approximate strategy
against the exact ranking.

The number that justifies every approximate path (sign-LSH buckets, IVF
probes, hybrid fusion depth) is recall against brute force at the same
k. This is itself a batch operator: both rankings are (query, key, rank)
DataFrames -- typically knn_join output or collected serve results --
and recall is one join + one aggregation.

At scale: rankings are (queries x k) rows; the join keys on
(query, key) and the aggregation on query -- both tiny relative to the
corpus that produced them. Nothing here touches the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
    query_col: str = "query_id",
    key_col: str = "_key",
    rank_col: str = "rank",
) -> DataFrame:
    """(query, n_exact, n_hit, recall) per query: |approx ∩ exact| / |exact|
    over each ranking's top-k.

    ``exact`` is ground truth (brute-force top-k); ``approx`` the
    strategy under test. Queries the approx side missed entirely still
    appear (n_hit 0) via the left join from the exact side.

    Per-query semantics: a query contributes a row iff the EXACT side
    has at least one row for it at rank <= k. A query present only on
    the approx side (missing/partial ground truth) is silently absent
    from the output -- and therefore from any macro average computed
    over it. :func:`mean_recall_at_k` checks for exactly this mismatch
    and warns, so a partially missing ground-truth frame can't quietly
    overstate recall."""
    # dedup both sides: a ranking with duplicate (query, key) rows
    # (e.g. unioned overlapping probes) would fan the join out and
    # inflate n_exact, breaking the |approx ∩ exact| / |exact| contract
    e = (
        exact.where(F.col(rank_col) <= k)
        .select(F.col(query_col).alias("__q"), F.col(key_col).alias("__k"))
        .dropDuplicates(["__q", "__k"])
    )
    a = (
        approx.where(F.col(rank_col) <= k)
        .select(F.col(query_col).alias("__q"), F.col(key_col).alias("__k"))
        .dropDuplicates(["__q", "__k"])
        .withColumn("__hit", F.lit(1))
    )
    return (
        e.join(a, ["__q", "__k"], "left")
        .groupBy("__q")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias("n_hit"),
        )
        .select(
            F.col("__q").alias(query_col),
            "n_exact",
            "n_hit",
            (F.col("n_hit") / F.col("n_exact")).alias("recall"),
        )
    )


def mrr_at_k(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
    query_col: str = "query_id",
    key_col: str = "_key",
    rank_col: str = "rank",
) -> DataFrame:
    """(query, first_hit_rank, rr) per query: reciprocal rank of the
    FIRST approx result that appears anywhere in the exact top-k
    (binary relevance). Queries with no hit get rr = 0.0 and a null
    first_hit_rank. Macro-average the ``rr`` column for MRR@k."""
    e = (
        exact.where(F.col(rank_col) <= k)
        .select(F.col(query_col).alias("__q"), F.col(key_col).alias("__k"))
        .dropDuplicates(["__q", "__k"])
        .withColumn("__rel", F.lit(1))
    )
    a = (
        approx.where(F.col(rank_col) <= k)
        .select(
            F.col(query_col).alias("__q"),
            F.col(key_col).alias("__k"),
            F.col(rank_col).alias("__r"),
        )
        .dropDuplicates(["__q", "__k"])
    )
    # every query from the exact side survives (left join from e's
    # distinct queries), so no-hit queries report rr = 0
    queries = e.select("__q").distinct()
    hits = a.join(e, ["__q", "__k"]).groupBy("__q").agg(
        F.min("__r").alias("first_hit_rank")
    )
    return (
        queries.join(hits, "__q", "left")
        .select(
            F.col("__q").alias(query_col),
            F.col("first_hit_rank").cast("long").alias("first_hit_rank"),
            F.coalesce(
                F.lit(1.0) / F.col("first_hit_rank"), F.lit(0.0)
            ).alias("rr"),
        )
    )


def ndcg_at_k(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
    query_col: str = "query_id",
    key_col: str = "_key",
    rank_col: str = "rank",
    relevance_col: str | None = None,
) -> DataFrame:
    """(query, dcg, idcg, ndcg) per query.

    Binary relevance (default): an approx result at rank r is relevant
    iff it appears in the exact top-k; gain 1/log2(r+1). The ideal DCG
    places every exact hit at the top, so ndcg = 1 exactly when the
    approx ranking contains the whole exact set in its first |exact|
    positions.

    Graded relevance: pass ``relevance_col`` naming a non-negative gain
    column on the EXACT side (e.g. the exact leg's similarity score);
    an approx hit contributes rel/log2(r+1) and the ideal ranking
    orders the exact set by descending gain. Binary is the special
    case rel = 1. Ground truth should carry one gain per (query, key);
    duplicate rows keep an arbitrary one. A query whose gains are ALL
    zero has idcg = 0 and ndcg is undefined -- it comes back NULL (not
    NaN), so Spark aggregates skip it rather than poisoning the mean;
    such a query can only arise under graded relevance."""
    e_cols = [
        F.col(query_col).alias("__q"),
        F.col(key_col).alias("__k"),
    ]
    if relevance_col is not None:
        e_cols.append(F.col(relevance_col).cast("double").alias("__rel"))
    e = (
        exact.where(F.col(rank_col) <= k)
        .select(*e_cols)
        .dropDuplicates(["__q", "__k"])
    )
    if relevance_col is None:
        e = e.withColumn("__rel", F.lit(1.0))
    a = (
        approx.where(F.col(rank_col) <= k)
        .select(
            F.col(query_col).alias("__q"),
            F.col(key_col).alias("__k"),
            F.col(rank_col).alias("__r"),
        )
        .dropDuplicates(["__q", "__k"])
    )
    gain = F.col("__rel") / F.log2(F.col("__r") + F.lit(1.0))
    dcg = (
        a.join(e, ["__q", "__k"])
        .groupBy("__q")
        .agg(F.sum(gain).alias("dcg"))
    )
    # ideal: the i-th highest-gain exact hit sits at rank i. posexplode
    # of the descending-sorted gain list keeps this one aggregation per
    # query over <= k elements -- no window, no second shuffle shape.
    idcg = (
        e.groupBy("__q")
        .agg(
            F.sort_array(F.collect_list("__rel"), asc=False).alias("__rels")
        )
        .select("__q", F.posexplode("__rels").alias("__pos", "__rel"))
        .groupBy("__q")
        .agg(
            F.sum(
                F.col("__rel") / F.log2(F.col("__pos") + F.lit(2.0))
            ).alias("idcg")
        )
    )
    return (
        idcg.join(dcg, "__q", "left")
        .select(
            F.col("__q").alias(query_col),
            F.coalesce("dcg", F.lit(0.0)).alias("dcg"),
            "idcg",
            F.when(
                F.col("idcg") > 0,
                F.coalesce("dcg", F.lit(0.0)) / F.col("idcg"),
            ).alias("ndcg"),
        )
    )


def mean_recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
    query_col: str = "query_id",
    key_col: str = "_key",
    rank_col: str = "rank",
    check_ground_truth: bool = True,
) -> float:
    """Macro-averaged recall@k (one scalar; equal weight per query).

    Raises on an empty ground-truth frame -- reporting 0.0 there would
    disguise a broken eval input (empty exact side, ranks that never
    pass the k cutoff) as a catastrophically bad ANN configuration.
    Warns when the approx side contains queries the exact side lacks:
    those queries are excluded from the average (see
    :func:`recall_at_k`'s per-query semantics), which would otherwise
    silently overstate recall under partial ground truth. The check is
    one extra (tiny) Spark job over the ranking frames; pass
    ``check_ground_truth=False`` in tight sweep loops whose inputs are
    known-complete."""
    import warnings

    missing = 0 if not check_ground_truth else (
        approx.where(F.col(rank_col) <= k)
        .select(F.col(query_col).alias("__q"))
        .distinct()
        .join(
            exact.where(F.col(rank_col) <= k)
            .select(F.col(query_col).alias("__q"))
            .distinct(),
            "__q",
            "left_anti",
        )
        .count()
    )
    if missing:
        warnings.warn(
            f"{missing} approx-side quer{'y' if missing == 1 else 'ies'} "
            "have no ground-truth rows at rank <= "
            f"{k} and are excluded from the macro average",
            stacklevel=2,
        )
    per_q = recall_at_k(approx, exact, k, query_col, key_col, rank_col)
    row = per_q.agg(F.avg("recall").alias("r")).collect()[0]
    if row["r"] is None:
        raise ValueError(
            "no exact-ranking rows at or below rank "
            f"{k}: nothing to evaluate against"
        )
    return float(row["r"])
