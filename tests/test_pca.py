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
