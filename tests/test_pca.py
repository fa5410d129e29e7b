"""Distributed PCA (operators/pca.py): fixed-point moment pass ==
sequential twin bit-for-bit, repartition invariance, sign convention,
map-only transform, validation."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from letsearch_spark.operators.pca import (
    fit_pca,
    fit_pca_twin,
    transform_pca,
)


def _emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").alias("vector")
    )


def _x(spark, sf_dir):
    rows = _emb(spark, sf_dir).orderBy("vec_id").collect()
    return np.array([r["vector"] for r in rows], dtype=np.float64)


def test_fit_pca_matches_twin_bitwise(spark, sf_dir):
    """The whole point of the integer moments: the distributed fit and
    the sequential twin produce the SAME model -- mean, components,
    explained variance, to the last bit -- under any partitioning."""
    emb = _emb(spark, sf_dir)
    x = _x(spark, sf_dir)
    twin = fit_pca_twin(x, k=8)
    for parts in (3, 17):
        m = fit_pca(emb.repartition(parts), k=8)
        assert m.mean.tolist() == twin.mean.tolist()
        assert m.components.tolist() == twin.components.tolist()
        assert (
            m.explained_variance.tolist()
            == twin.explained_variance.tolist()
        )
    # eigenvalues descending, sign convention: max-|coeff| entry positive
    ev = twin.explained_variance
    assert all(ev[i] >= ev[i + 1] for i in range(len(ev) - 1))
    for comp in twin.components:
        assert comp[int(np.argmax(np.abs(comp)))] > 0


def test_transform_pca_projects_and_keeps_nulls(spark, sf_dir):
    """Map-only projection: matches the numpy (x - mean) @ W.T to
    1e-12 (BLAS batch blocking may differ by ULPs), nulls pass
    through, variance captured grows with k."""
    emb = _emb(spark, sf_dir)
    x = _x(spark, sf_dir)
    model = fit_pca(emb, k=8)
    out = transform_pca(emb, model).orderBy("vec_id").collect()
    got = np.array([r["pca_vector"] for r in out], dtype=np.float64)
    want = (x - model.mean) @ model.components.T
    assert got.shape == (len(x), 8)
    assert np.max(np.abs(got - want)) < 1e-12
    # zero shuffles: single mapInPandas over the scan
    plan = (
        transform_pca(emb, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan

    withnull = emb.withColumn(
        "vector", F.when(F.col("vec_id") % 7 == 0, None).otherwise(F.col("vector"))
    )
    outn = transform_pca(withnull, model).orderBy("vec_id").collect()
    for r in outn:
        assert (r["pca_vector"] is None) == (r["vec_id"] % 7 == 0)

    # reconstruction improves with k: residual variance shrinks
    def resid(k):
        m = fit_pca_twin(x, k=k)
        proj = (x - m.mean) @ m.components.T
        rec = proj @ m.components + m.mean
        return float(((x - rec) ** 2).sum())

    assert resid(16) < resid(8) < resid(2)


def test_fit_pca_validation(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    with pytest.raises(ValueError, match="k must be"):
        fit_pca(emb, k=0)
    with pytest.raises(ValueError, match="exceeds vector dim"):
        fit_pca(emb, k=1000)
    empty = emb.where("vec_id < 0")
    with pytest.raises(ValueError, match="no non-null vectors"):
        fit_pca(empty, k=2)
    mixed = emb.limit(5).union(
        emb.limit(5).select("vec_id", F.slice("vector", 1, 8).alias("vector"))
    )
    with pytest.raises(ValueError, match="mixed vector dimensions"):
        fit_pca(mixed, k=2)


def _subspace_df(spark, n=120, d=64, k=8, seed=3):
    """Vectors lying EXACTLY in a k-dim linear subspace with zero
    empirical mean (each base vector paired with its negation): PCA
    with k components is then an isometry of the data, so reduced-space
    cosines equal full-dim cosines up to quantization -- the fixture
    that lets approximate-by-design pca= paths be tested for exact
    agreement."""
    rng = np.random.RandomState(seed)
    basis, _ = np.linalg.qr(rng.normal(size=(d, k)))
    half = rng.normal(size=(n // 2, k)) @ basis.T
    x = np.vstack([half, -half])
    return spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(x)],
        "id long, vector array<double>",
    )


def test_embedding_cosine_pairs_pca_knob(spark):
    """r9 (VERDICT r8 #5): pca= pre-projection on
    embedding_cosine_pairs. On the zero-mean exact-subspace fixture the
    k-dim projection preserves every cosine, so the pair set matches
    full-dim exactly; passing the fitted model and passing the int k
    must agree bit-for-bit (fit_pca is deterministic)."""
    from letsearch_spark.operators.dedup import embedding_cosine_pairs
    from letsearch_spark.operators.pca import fit_pca

    df = _subspace_df(spark)
    full = {
        (r["id_a"], r["id_b"])
        for r in embedding_cosine_pairs(df, "id", "vector", 0.9).collect()
    }
    red = embedding_cosine_pairs(df, "id", "vector", 0.9, pca=8).collect()
    assert {(r["id_a"], r["id_b"]) for r in red} == full
    model = fit_pca(df, vec_col="vector", k=8)
    red2 = embedding_cosine_pairs(
        df, "id", "vector", 0.9, pca=model
    ).collect()
    assert sorted(map(tuple, red)) == sorted(map(tuple, red2))
    # the lsh path accepts it too (dim is taken from the model)
    lsh = embedding_cosine_pairs(
        df, "id", "vector", 0.9, method="lsh", lsh_bits=4, pca=8
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in lsh} <= full


def test_semantic_dedup_pca_knob(spark):
    """semantic_dedup(pca=k) on the exact-subspace fixture keeps the
    same survivors as full-dim (projection is an isometry there), and
    kmeans_fit_full(pca=k) returns k-dim centroids."""
    from letsearch_spark.operators.ann import kmeans_fit_full
    from letsearch_spark.operators.dedup import semantic_dedup

    df = _subspace_df(spark)
    # plant exact duplicates so the keep rule has work to do
    dup = df.where(F.col("id") < 10).withColumn("id", F.col("id") + 1000)
    both = df.unionByName(dup)
    full = {
        r["id"]: r["keep"]
        for r in semantic_dedup(
            both, "id", "vector", threshold=0.999, nlist=4
        ).collect()
    }
    red = {
        r["id"]: r["keep"]
        for r in semantic_dedup(
            both, "id", "vector", threshold=0.999, nlist=4, pca=8
        ).collect()
    }
    assert red == full
    assert sum(1 for v in full.values() if not v) >= 10  # dups dropped

    cent = kmeans_fit_full(
        df, nlist=4, vec_col="vector", key_col="id", pca=8
    )
    assert cent.shape == (4, 8)


def test_prep_semantic_dedup_stage(spark):
    """PrepConfig(semantic_dedup=...) (r9 pipeline hook): the stage
    drops reduced-space near-dups and shows up in the audit."""
    from letsearch_spark.pipeline import PrepConfig, prepare_training_data

    df = _subspace_df(spark, n=60)
    docs = df.select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body text number "), F.col("id")).alias(
            "text"
        ),
        F.col("vector").alias("embedding"),
    )
    dup = docs.where(F.col("doc_id") < 5).withColumn(
        "doc_id", F.col("doc_id") + 500
    )
    out, _layout, audit = prepare_training_data(
        docs.unionByName(dup),
        PrepConfig(
            quality=None,
            fuzzy_dedup=None,
            line_dedup=None,
            semantic_dedup={"threshold": 0.999, "nlist": 2, "pca": 8},
            split_weights=None,
        ),
    )
    assert audit["semantic_dedup"] == 60  # the 5 planted dups dropped
    assert out.count() == 60


def test_prep_semantic_dedup_keeps_null_embeddings(spark):
    """r9 review catch: a doc with a NULL embedding gets no verdict
    from semantic_dedup -- the stage must KEEP it (no verdict is never
    a delete), like every other dedup stage."""
    from letsearch_spark.pipeline import PrepConfig, prepare_training_data

    df = _subspace_df(spark, n=40)
    docs = df.select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body text of document "), F.col("id")).alias("text"),
        F.col("vector").alias("embedding"),
    )
    nulls = spark.createDataFrame(
        [(700, "null-embedding doc body", None),
         (701, "another null-embedding doc", None)],
        "doc_id long, text string, embedding array<double>",
    )
    out, _layout, audit = prepare_training_data(
        docs.unionByName(nulls),
        PrepConfig(
            quality=None, fuzzy_dedup=None, line_dedup=None,
            semantic_dedup={"threshold": 0.999, "nlist": 2, "pca": 8},
            split_weights=None,
        ),
    )
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 700 in kept and 701 in kept
    assert audit["semantic_dedup"] == 42
