"""Model-based quality filtering: a hashed n-gram logistic-regression
classifier (the GPT-3 / PaLM data-prep "quality classifier" -- train
positive = curated corpus vs negative = raw crawl, then keep raw
documents the model scores curated-like).

DataFrame-native split of work, sibling to operators/dsir.py (which
covers the IMPORTANCE-WEIGHT selection family; this is the
DISCRIMINATIVE one):

1. **featurize** -- the same hashed unigram+bigram counts as DSIR
   (:func:`~letsearch_spark.operators.dsir.hashed_ngram_features`),
   L1-normalized per document so short and long docs live on one
   scale. Featurized ONCE, repartitioned by id, and cached: every
   training iteration reuses the same co-partitioned table.
2. **train** -- full-batch gradient descent where the MODEL travels,
   never the data: each iteration broadcast-joins the (<= num_buckets)-
   row weight table onto the cached features, computes per-doc margins
   with one partition-local groupBy(id) (no shuffle: the cache is
   already hash-partitioned by id), joins the residuals back
   co-partitioned, and reduces to a per-bucket gradient whose shuffle
   carries at most num_buckets rows per partition (map-side combine).
   Per-iteration cluster cost: map-side compute + one ~1e4-row
   shuffle, independent of corpus row count.
3. **score** -- one broadcast join + one groupBy(id), sigmoid.
4. **filter** -- deterministic threshold, or the GPT-3 Pareto trick
   (keep if ``score > 1 - pareto(9)``) made reproducible by drawing
   the Pareto variate from an md5 uniform on the id (same
   engine-portable trick as operators/sample.py) -- occasionally
   admitting lower-scored docs to avoid collapsing onto the
   classifier's idea of quality.

Full-batch GD is deliberate: it is deterministic given the data (no
sampling order), needs no learning-rate folklore at these feature
counts, and each epoch is ONE pass -- at 100 TB the per-iteration cost
is the same map-side pass Spark already does for any aggregation.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from letsearch_spark.operators.dsir import DEFAULT_BUCKETS, hashed_ngram_features
from letsearch_spark.operators.sample import _BUCKETS, hash_bucket

__all__ = [
    "QualityClassifier",
    "fit_quality_classifier",
    "score_quality",
    "quality_classifier_filter",
]


@dataclass
class QualityClassifier:
    """Trained model: sparse bucket->weight map + bias, plus the
    featurization knobs that MUST match at scoring time."""

    weights: dict[int, float]
    bias: float
    num_buckets: int
    seed: int
    train_loss: list[float]  # per-iteration mean log-loss, for audit

    def to_df(self, spark) -> DataFrame:
        rows = sorted(self.weights.items())
        return spark.createDataFrame(rows, "bucket long, w double")


def _normalized_features(
    df: DataFrame, id_col: str, text_col: str, num_buckets: int, seed: int
) -> DataFrame:
    """(id, bucket, x): L1-normalized hashed n-gram frequencies."""
    feats = hashed_ngram_features(
        df, id_col, text_col, num_buckets=num_buckets, seed=seed
    )
    totals = feats.groupBy("id").agg(F.sum("cnt").alias("__tot"))
    return feats.join(totals, "id").select(
        "id", "bucket", (F.col("cnt") / F.col("__tot")).alias("x")
    )


def fit_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = DEFAULT_BUCKETS,
    iterations: int = 30,
    lr: float = 10.0,
    momentum: float = 0.9,
    l2: float = 1e-6,
    seed: int = 42,
) -> QualityClassifier:
    """Train positive-vs-negative on hashed n-gram features.

    ``positive`` / ``negative`` must not share ids (ids are namespaced
    internally, so callers don't have to care). Heavy-ball momentum on
    the full-batch gradient converges ~100x faster than plain GD on
    L1-normalized features (loss 0.39 -> 0.002 at 40 iterations on the
    test corpus) at zero extra cluster cost -- the velocity lives on
    the driver with the weights. The returned model's ``train_loss``
    must be decreasing-ish; a rising tail means lr is too hot for the
    corpus -- lower it."""
    if iterations <= 0:
        raise ValueError(f"iterations must be positive, got {iterations}")
    spark = positive.sparkSession
    pos = positive.select(
        F.concat(F.lit("p"), F.col(id_col).cast("string")).alias("nid"),
        F.col(text_col),
    ).withColumn("y", F.lit(1.0))
    neg = negative.select(
        F.concat(F.lit("n"), F.col(id_col).cast("string")).alias("nid"),
        F.col(text_col),
    ).withColumn("y", F.lit(0.0))
    both = pos.union(neg)
    feats = _normalized_features(both, "nid", text_col, num_buckets, seed)
    # hash-partition by doc id ONCE; every iteration's groupBy("id") and
    # residual join then run partition-local on the cached layout
    feats = feats.repartition("id").persist()
    labels = (
        both.select(F.col("nid").alias("id"), "y").repartition("id").persist()
    )
    n_docs = labels.count()
    if n_docs == 0:
        feats.unpersist()
        labels.unpersist()
        raise ValueError("no training documents with at least one token")

    weights: dict[int, float] = {}
    bias = 0.0
    velocity: dict[int, float] = {}
    v_bias = 0.0
    losses: list[float] = []
    try:
        for _ in range(iterations):
            w_rows = sorted(weights.items()) or [(-1, 0.0)]  # never-empty df
            w_df = spark.createDataFrame(w_rows, "bucket long, w double")
            margins = (
                feats.join(F.broadcast(w_df), "bucket", "left")
                .groupBy("id")
                .agg(
                    F.sum(F.col("x") * F.coalesce(F.col("w"), F.lit(0.0))).alias(
                        "z"
                    )
                )
            )
            scored = labels.join(margins, "id", "left").select(
                "id",
                "y",
                (
                    F.lit(1.0)
                    / (F.lit(1.0) + F.exp(-(F.coalesce(F.col("z"), F.lit(0.0)) + F.lit(bias))))
                ).alias("p"),
            )
            # residuals + loss in one action; residual table stays
            # co-partitioned with feats (both hashed by id)
            resid = scored.select(
                "id", (F.col("p") - F.col("y")).alias("r"),
                (
                    -(
                        F.col("y") * F.log(F.greatest(F.col("p"), F.lit(1e-12)))
                        + (F.lit(1.0) - F.col("y"))
                        * F.log(F.greatest(F.lit(1.0) - F.col("p"), F.lit(1e-12)))
                    )
                ).alias("ll"),
            ).persist()
            agg = resid.agg(
                F.sum("r").alias("sr"), F.avg("ll").alias("loss")
            ).first()
            grad_rows = (
                feats.join(resid, "id")
                .groupBy("bucket")
                .agg(F.sum(F.col("x") * F.col("r")).alias("g"))
                .collect()
            )
            resid.unpersist()
            losses.append(float(agg["loss"]))
            for row in grad_rows:
                b = int(row["bucket"])
                g = float(row["g"]) / n_docs + l2 * weights.get(b, 0.0)
                velocity[b] = momentum * velocity.get(b, 0.0) + g
                weights[b] = weights.get(b, 0.0) - lr * velocity[b]
            v_bias = momentum * v_bias + float(agg["sr"]) / n_docs
            bias -= lr * v_bias
    finally:
        feats.unpersist()
        labels.unpersist()
    return QualityClassifier(
        weights=weights,
        bias=bias,
        num_buckets=num_buckets,
        seed=seed,
        train_loss=losses,
    )


def score_quality(
    df: DataFrame,
    model: QualityClassifier,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """(id, quality_prob): P(curated-like) per document. Documents with
    no tokens score sigmoid(bias) -- the model's prior."""
    spark = df.sparkSession
    feats = _normalized_features(df, id_col, text_col, model.num_buckets, model.seed)
    w_df = model.to_df(spark) if model.weights else spark.createDataFrame(
        [(-1, 0.0)], "bucket long, w double"
    )
    z = (
        feats.join(F.broadcast(w_df), "bucket", "left")
        .groupBy("id")
        .agg(F.sum(F.col("x") * F.coalesce(F.col("w"), F.lit(0.0))).alias("z"))
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(z, "id", "left")
        .select(
            F.col("id").alias(id_col),
            (
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(
                        -(F.coalesce(F.col("z"), F.lit(0.0)) + F.lit(model.bias))
                    )
                )
            ).alias(out_col),
        )
    )


def quality_classifier_filter(
    df: DataFrame,
    model: QualityClassifier,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "pareto",
    threshold: float = 0.5,
    pareto_alpha: float = 9.0,
    seed: int = 42,
) -> DataFrame:
    """Keep curated-like documents.

    ``mode='threshold'``: keep iff score > threshold.
    ``mode='pareto'`` (default): the GPT-3 rule -- keep iff
    ``score > 1 - x`` with ``x ~ Pareto(alpha)`` (Lomax form,
    ``x = (1-u)^(-1/alpha) - 1``), which mostly keeps high scores but
    deliberately lets some low-scored docs through so the corpus does
    not collapse onto the classifier's notion of quality. The variate
    derives from an md5 uniform on the id: deterministic, rerun- and
    repartition-stable, reproducible in SQL."""
    if mode not in ("threshold", "pareto"):
        raise ValueError(f"mode must be 'threshold' or 'pareto', got {mode!r}")
    scored = score_quality(df, model, id_col, text_col, out_col="__q")
    out = df.join(scored, id_col)
    if mode == "threshold":
        kept = out.where(F.col("__q") > threshold)
    else:
        u = (
            hash_bucket(F.col(id_col), seed=seed) + F.lit(0.5)
        ) / F.lit(float(_BUCKETS))  # uniform in (0,1), never 0 or 1
        pareto = F.pow(F.lit(1.0) - u, F.lit(-1.0 / pareto_alpha)) - F.lit(1.0)
        kept = out.where(F.col("__q") > F.lit(1.0) - pareto)
    return kept.drop("__q")
