"""Distributed PCA for embedding columns: the dimensionality-reduction
lever every large vector pipeline eventually pulls (serve RAM, ANN
build cost, and shuffle bytes all scale with dim; 64 -> 16 dims is a 4x
cut everywhere downstream for a few points of recall).

Spark-first shape -- the textbook two-phase split:

* **moment pass** (distributed, the only corpus-sized work): one
  Arrow-batched ``mapInPandas`` emits per-partition fixed-point sums of
  the vectors and the UPPER TRIANGLE of their outer products (exactly
  d + d*(d+1)/2 integers per partition -- IEEE multiplication commutes,
  so the symmetric half reconstructs bit-exactly), reduced by ONE
  integer ``groupBy().sum()``. Integer addition commutes, so the
  accumulated moments -- and everything derived from them -- are
  BIT-IDENTICAL across partitionings, retries, and against the
  sequential twin (the same trick kmeans_fit_full / mean_pool_vectors
  use). The shuffle carries d(d+3)/2 numbers per partition, never
  rows; the per-batch outer-product tensor is chunked on the row axis
  to a bounded working set (wide embeddings would otherwise allocate
  batch_rows x d x d doubles).
* **eigen step** (driver, corpus-size independent): covariance from the
  moments, ``numpy.linalg.eigh`` on the d x d symmetric matrix,
  components = top-k eigenvectors (descending eigenvalue), each
  sign-fixed so its largest-|coefficient| entry is positive --
  eigenvectors are only defined up to sign, and the convention makes
  the fitted model reproducible across LAPACK builds.
* **transform** (map-only): ``(x - mean) @ components.T`` per Arrow
  batch; zero shuffles, the components ride the task closure
  (k*d doubles -- tiny).

No reference analog (SURVEY.md §2.7 north-star family); the method is
classical (Pearson 1901 / Hotelling 1933), the fixed-point determinism
treatment follows the repo's kmeans/pooling operators.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNITS = 10**6


@dataclass
class PCAModel:
    """Fitted PCA: ``mean`` (d,), ``components`` (k, d) rows =
    descending-eigenvalue principal axes, ``explained_variance`` (k,)."""

    mean: np.ndarray
    components: np.ndarray
    explained_variance: np.ndarray

    @property
    def k(self) -> int:
        return int(self.components.shape[0])


def _moment_sums(x: np.ndarray, u: float) -> tuple[np.ndarray, np.ndarray]:
    """Fixed-point moment sums of one row block, shared verbatim by the
    distributed pass and the twin: (s1[d], s2_upper_triangle[d(d+1)/2])
    int64. Row-chunked so the (rows, tri) working set stays ~32 MB of
    doubles at any dim."""
    n, d = x.shape
    iu, ju = np.triu_indices(d)
    step = max(1, (1 << 22) // (d * d))
    s1 = np.zeros(d, dtype=np.int64)
    s2 = np.zeros(len(iu), dtype=np.int64)
    for lo in range(0, n, step):
        xc = x[lo : lo + step]
        # cast each quantized ELEMENT to int64 before summing (ADVICE
        # r8): a float64 chunk sum can pass 2^53 for large-magnitude
        # vectors, and float accumulation order varies with Arrow batch
        # boundaries -- integer accumulation is exact at any order
        q1 = (np.sign(xc * u) * np.floor(np.abs(xc * u) + 0.5)).astype(
            np.int64
        )
        s1 += q1.sum(axis=0)
        # upper triangle computed DIRECTLY (x_i*x_j == x_j*x_i exactly,
        # IEEE multiply commutes): half the flops/memory of a full
        # outer product, and the symmetric matrix reconstructs
        # bit-identically on the driver
        outer = xc[:, iu] * xc[:, ju]
        q2 = (
            np.sign(outer * u) * np.floor(np.abs(outer * u) + 0.5)
        ).astype(np.int64)
        s2 += q2.sum(axis=0)
    return s1, s2


def _tri_to_full(tri: np.ndarray, d: int) -> np.ndarray:
    iu, ju = np.triu_indices(d)
    full = np.zeros((d, d), dtype=np.float64)
    full[iu, ju] = tri
    full[ju, iu] = tri
    return full


def _moments_to_model(
    n: int, s1: np.ndarray, s2: np.ndarray, k: int, units: int
) -> PCAModel:
    """Driver half, shared verbatim by the distributed path and the
    twin: fixed-point moment integers -> mean/covariance -> top-k
    sign-fixed eigenvectors."""
    d = s1.shape[0]
    mean = (s1 / units) / n
    # E[xx^T] - mean mean^T (moments are exact integers / units)
    exx = (s2 / units) / n
    cov = exx - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh((cov + cov.T) / 2.0)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(
        mean=mean,
        components=comps,
        explained_variance=np.maximum(evals[order], 0.0),
    )


def fit_pca(
    df: DataFrame,
    vec_col: str = "vector",
    k: int = 16,
    units: int = _UNITS,
) -> PCAModel:
    """Fit PCA over every non-null vector of ``df[vec_col]`` in ONE
    distributed moment pass + a driver eigendecomposition. Result is
    bit-identical across partitionings (fixed-point integer moments).

    ``units`` is the fixed-point quantization of each per-row moment
    contribution (value * units, half-away-from-zero); 1e6 keeps the
    integer sums inside int64 for corpora up to ~1e9 rows of unit-norm
    64-dim vectors while pinning 6 decimal places of each product."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    rows = df.select(vec_col).where(F.col(vec_col).isNotNull())
    u = float(units)

    def gen(batches):
        for pdf in batches:
            vecs = pdf.iloc[:, 0]
            if not len(vecs):
                continue
            # a batch may hold mixed dims (the error surfaces on the
            # driver, not as an opaque numpy shape crash in a task)
            by_len: dict[int, list] = {}
            for v in vecs.tolist():
                by_len.setdefault(len(v), []).append(v)
            for d, vs in sorted(by_len.items()):
                x = np.array(vs, dtype=np.float64)
                # quantize each row's contribution, THEN sum: integer
                # totals commute across any grouping of rows (shared
                # kernel -- the twin accumulates with the same code)
                s1, s2 = _moment_sums(x, u)
                yield pd.DataFrame(
                    {
                        "n": [int(len(x))],
                        "d": [d],
                        "s1": [s1.tolist()],
                        "s2": [s2.tolist()],
                    }
                )

    parts = rows.mapInPandas(
        gen, "n long, d int, s1 array<long>, s2 array<long>"
    ).persist()
    try:
        dims = [r["d"] for r in parts.select("d").distinct().collect()]
        if not dims:
            raise ValueError("no non-null vectors to fit PCA on")
        if len(dims) > 1:
            raise ValueError(f"mixed vector dimensions: {sorted(dims)}")
        d = int(dims[0])
        if k > d:
            raise ValueError(f"k={k} exceeds vector dim {d}")
        n = int(parts.agg(F.sum("n")).first()[0])
        # elementwise integer reduction as a DISTRIBUTED groupBy (map-
        # side combined), never a collect of per-partition arrays: the
        # driver receives exactly d + d(d+1)/2 (index, sum) rows -- no
        # more than the d x d it must eigendecompose anyway
        s1 = np.zeros(d, dtype=np.int64)
        for r in (
            parts.select(F.posexplode("s1").alias("i", "v"))
            .groupBy("i")
            .agg(F.sum("v").alias("s"))
            .collect()
        ):
            s1[int(r["i"])] = int(r["s"])
        tri = np.zeros(d * (d + 1) // 2, dtype=np.int64)
        for r in (
            parts.select(F.posexplode("s2").alias("i", "v"))
            .groupBy("i")
            .agg(F.sum("v").alias("s"))
            .collect()
        ):
            tri[int(r["i"])] = int(r["s"])
    finally:
        parts.unpersist()
    return _moments_to_model(n, s1, _tri_to_full(tri, d), k, units)


def fit_pca_twin(
    x: np.ndarray, k: int = 16, units: int = _UNITS
) -> PCAModel:
    """Single-process twin of :func:`fit_pca`: the SAME moment kernel
    (_moment_sums) and the SAME driver half -- bit-identical model;
    used by the unit test and the DuckDB computed oracle."""
    x = np.asarray(x, dtype=np.float64)
    s1, s2 = _moment_sums(x, float(units))
    return _moments_to_model(
        len(x), s1, _tri_to_full(s2, x.shape[1]), k, units
    )


def transform_pca(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "vector",
    out_col: str = "pca_vector",
) -> DataFrame:
    """Project ``vec_col`` onto the model's components: map-only, zero
    shuffles; null vectors stay null. Output is ``array<double>`` of
    length ``model.k``."""
    mean = model.mean.copy()
    comps = model.components.copy()
    cols = df.columns

    def gen(batches):
        for pdf in batches:
            vecs = pdf[vec_col]
            mask = vecs.notna()
            out = pd.Series([None] * len(pdf), dtype=object)
            if mask.any():
                x = np.array(vecs[mask].tolist(), dtype=np.float64)
                proj = (x - mean) @ comps.T
                out[np.flatnonzero(mask.to_numpy())] = [
                    p.tolist() for p in proj
                ]
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(gen, f"{schema}, {out_col} array<double>")


def resolve_projection(
    df: DataFrame, vec_col: str, pca
) -> tuple[DataFrame, "PCAModel | None"]:
    """The optional PCA pre-projection knob shared by the
    embedding-space operators (r9, VERDICT r8 #5: semantic_dedup /
    embedding_cosine_pairs / kmeans_fit_full): ``pca`` is None (no-op),
    an int k (fit on this frame's non-null vectors, then project), or a
    fitted :class:`PCAModel` (project only -- fit once upstream, reuse
    everywhere). Returns (frame with ``vec_col`` REPLACED by the k-dim
    projection, model used).

    Why: every downstream shuffle of these operators carries the
    vectors (bucket joins, cluster-keyed exchanges, pooled means) --
    dim 64 -> 16 is a 4x cut in those shuffle bytes, and the per-pair /
    per-cluster numpy work shrinks the same way. Cosine in the reduced
    space is an APPROXIMATION of full-dim cosine (centering + truncation
    both move angles), so results are approximate-with-measured-recall,
    exactly like the LSH/banded paths: SCALING.md carries the recall
    table, and callers wanting exactness simply leave pca=None."""
    if pca is None:
        return df, None
    model = (
        pca
        if isinstance(pca, PCAModel)
        else fit_pca(
            df.select(vec_col).where(F.col(vec_col).isNotNull()),
            vec_col=vec_col,
            k=int(pca),
        )
    )
    out = transform_pca(df, model, vec_col=vec_col, out_col="__pca_proj")
    return out.drop(vec_col).withColumnRenamed("__pca_proj", vec_col), model
