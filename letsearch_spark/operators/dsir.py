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
    """(id, bucket, cnt): hashed unigram+bigram counts per document."""
    words = tokenize(F.col(text_col))
    bigrams = F.expr(
        "transform(sequence(0, size(__w) - 2),"
        " i -> concat(element_at(__w, i + 1), ' ', element_at(__w, i + 2)))"
    )
    feats = F.concat(F.col("__w"), F.when(F.size("__w") >= 2, bigrams).otherwise(F.array()))
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
    output of :func:`hashed_ngram_features` on each corpus."""

    def marginal(feats: DataFrame, name: str) -> DataFrame:
        return feats.groupBy("bucket").agg(F.sum("cnt").alias(name))

    t = marginal(target_feats, "t_cnt")
    r = marginal(raw_feats, "r_cnt")
    # totals: two scalars; computed once driver-side
    t_total = t.agg(F.sum("t_cnt")).collect()[0][0] or 0
    r_total = r.agg(F.sum("r_cnt")).collect()[0][0] or 0
    joined = t.join(r, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("t_cnt", F.lit(0)).alias("t_cnt"),
        F.coalesce("r_cnt", F.lit(0)).alias("r_cnt"),
    )
    log_p_t = F.log(
        (F.col("t_cnt") + alpha) / F.lit(float(t_total + alpha * num_buckets))
    )
    log_p_r = F.log(
        (F.col("r_cnt") + alpha) / F.lit(float(r_total + alpha * num_buckets))
    )
    return joined.select("bucket", (log_p_t - log_p_r).alias("log_ratio"))


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
) -> DataFrame:
    """Top-k raw documents by Gumbel-perturbed importance weight:
    (id, log_w, gumbel_key) -- sampling without replacement proportional
    to w(x), deterministic for a fixed seed.

    The Gumbel variate derives from an md5 uniform on the id (same
    engine-portable trick as operators/sample.py), so a rerun or a
    repartition returns the identical sample."""
    raw_feats = hashed_ngram_features(
        raw, id_col, text_col, num_buckets=num_buckets, seed=seed
    )
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
    return (
        weights.select(
            F.col("id").alias(id_col),
            "log_w",
            (F.col("log_w") + gumbel).alias("gumbel_key"),
        )
        .orderBy(F.desc("gumbel_key"), F.asc(id_col))
        .limit(k)
    )
