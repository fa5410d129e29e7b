"""DSIR-style importance resampling for training-data selection.

Data Selection via Importance Resampling (Xie et al., 2023): pick raw
documents whose hashed n-gram feature distribution looks like a small
target corpus. DataFrame-native:

1. **featurize** -- unigram+bigram counts hashed into ``num_buckets``
   (the paper's hashed n-gram feature space). Pure Catalyst: tokenize,
   n-gram via zipped shifted slices, md5-hash mod buckets, explode,
   one (id, bucket) count shuffle.
2. **fit** -- bucket-marginal counts of target vs raw corpus, Laplace
   smoothing, per-bucket log probability ratio. The model is a
   ``num_buckets``-row DataFrame (1e4 rows by default -- broadcastable
   anywhere).
3. **score** -- log importance weight of every raw document:
   ``log w(x) = sum over features of count * log_ratio[bucket]`` via a
   broadcast join + one groupBy(id) shuffle.
4. **resample** -- Gumbel-top-k: ``log w + Gumbel(md5-seeded)`` makes
   sampling-without-replacement proportional to the importance weight,
   deterministic across runs/partitionings (same md5-uniform trick as
   operators/sample.py), and a plain TakeOrderedAndProject computes it.

At 100 TB: featurization is map-side; the only corpus-sized shuffles
are the (id, bucket) count and the per-doc score sum, both rows of
three integers; the model never exceeds num_buckets rows; top-k never
globally sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from letsearch_spark.operators.bm25 import tokenize
from letsearch_spark.operators.dedup import md5_60

DEFAULT_BUCKETS = 10_000


def hashed_ngram_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_buckets: int = DEFAULT_BUCKETS,
    seed: int = 42,
) -> DataFrame:
    """(id, bucket, cnt): hashed unigram+bigram counts per document.

    Bigrams come from zip_with over two shifted slices -- the lambda
    touches only its own element args, never an outer expression, so
    nothing is re-evaluated per element (the transform(sequence(...),
    element_at-lambda) form is O(words^2) per document; see the scale
    lesson in SCALING.md and ngram_lm._doc_ngrams)."""
    words = tokenize(F.col(text_col))
    length = F.size(F.col("__w"))
    bigrams = F.zip_with(
        F.slice(F.col("__w"), 1, length - 1),
        F.slice(F.col("__w"), 2, length - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    feats = F.concat(F.col("__w"), bigrams)
    return (
        df.select(F.col(id_col).alias("id"), words.alias("__w"))
        .where(F.size("__w") > 0)
        .select("id", F.explode(feats).alias("__f"))
        .select(
            "id",
            (
                md5_60(F.concat(F.col("__f"), F.lit(f"#dsir{seed}")))
                % num_buckets
            ).alias("bucket"),
        )
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def fit_log_ratio(
    target_feats: DataFrame,
    raw_feats: DataFrame,
    num_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
) -> DataFrame:
    """(bucket, log_ratio): smoothed log(p_target[b] / p_raw[b]).

    Laplace ``alpha`` keeps never-seen buckets finite. Input is the
    output of :func:`hashed_ngram_features` on each corpus.

    Each corpus is featurized exactly ONCE here: the bucket marginals
    (<= num_buckets rows -- 1e4 by default, the paper's size) are
    collected and the model assembled driver-side, so the returned
    model DataFrame carries no corpus lineage to recompute downstream."""
    import math

    def marginal(feats: DataFrame) -> dict[int, int]:
        rows = feats.groupBy("bucket").agg(F.sum("cnt").alias("c")).collect()
        return {int(r["bucket"]): int(r["c"]) for r in rows}

    t_cnt = marginal(target_feats)
    r_cnt = marginal(raw_feats)
    t_den = float(sum(t_cnt.values()) + alpha * num_buckets)
    r_den = float(sum(r_cnt.values()) + alpha * num_buckets)
    rows = [
        (
            b,
            math.log((t_cnt.get(b, 0) + alpha) / t_den)
            - math.log((r_cnt.get(b, 0) + alpha) / r_den),
        )
        for b in sorted(set(t_cnt) | set(r_cnt))
    ]
    return target_feats.sparkSession.createDataFrame(
        rows, "bucket long, log_ratio double"
    )


def importance_weights(
    raw_feats: DataFrame, log_ratio: DataFrame
) -> DataFrame:
    """(id, log_w): per-document log importance weight.

    Buckets absent from the model contribute 0 (their ratio was never
    informed by either corpus)."""
    return (
        raw_feats.join(F.broadcast(log_ratio), "bucket", "left")
        .groupBy("id")
        .agg(
            F.sum(
                F.col("cnt") * F.coalesce(F.col("log_ratio"), F.lit(0.0))
            ).alias("log_w")
        )
    )


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
    seed: int = 42,
    cache_features: bool = True,
) -> DataFrame:
    """Top-k raw documents by Gumbel-perturbed importance weight:
    (id, log_w, gumbel_key) -- sampling without replacement proportional
    to w(x), deterministic for a fixed seed.

    The Gumbel variate derives from an md5 uniform on the id (same
    engine-portable trick as operators/sample.py), so a rerun or a
    repartition returns the identical sample.

    The raw corpus's features feed BOTH the model fit (eager, here) and
    the returned weight plan; ``cache_features`` persists them
    (MEMORY_AND_DISK) so the corpus is featurized once, not twice. In
    that mode the k-row result is eagerly materialized (localCheckpoint
    -- k rows of three scalars, executor-resident) so the feature cache
    can be released before returning: repeated pipeline runs do NOT
    accumulate persisted feature tables. Pass False for a fully lazy
    plan (featurizes twice, zero cache footprint)."""
    raw_feats = hashed_ngram_features(
        raw, id_col, text_col, num_buckets=num_buckets, seed=seed
    )
    if cache_features:
        from pyspark import StorageLevel

        raw_feats = raw_feats.persist(StorageLevel.MEMORY_AND_DISK)
    target_feats = hashed_ngram_features(
        target, id_col, text_col, num_buckets=num_buckets, seed=seed
    )
    model = fit_log_ratio(target_feats, raw_feats, num_buckets, alpha)
    weights = importance_weights(raw_feats, model)
    # u in (0, 1): (h + 1) / (2^60 + 1) never hits 0 or 1 exactly
    u = (
        md5_60(F.concat(F.col("id").cast("string"), F.lit(f"#gumbel{seed}")))
        + F.lit(1)
    ) / F.lit(float((1 << 60) + 1))
    gumbel = -F.log(-F.log(u))
    sampled = (
        weights.select(
            F.col("id").alias(id_col),
            "log_w",
            (F.col("log_w") + gumbel).alias("gumbel_key"),
        )
        .orderBy(F.desc("gumbel_key"), F.asc(id_col))
        .limit(k)
    )
    if cache_features:
        # materialize the (small) sample so the corpus-sized feature
        # cache can be dropped NOW instead of leaking across runs
        sampled = sampled.localCheckpoint(eager=True)
        raw_feats.unpersist()
    return sampled
