"""Vector scalar functions as JVM-side Column expressions.

These are the engine's equivalent of the reference's usearch cosine metric
(reference: src/collection/vector_index.rs:128-152; score convention
``score = 1 - cosine_distance`` i.e. the cosine similarity itself,
vector_index.rs:141-149).

Everything here is a Catalyst expression (``zip_with`` / ``aggregate``
higher-order functions) -- no Python UDF in the hot path, no
serialization across the JVM/Python boundary, and the expressions
participate in whole-stage planning. All arithmetic is promoted to
double so results are deterministic and match a DuckDB double-precision
oracle bit-for-bit after rounding.

For very wide vectors in throughput-critical scans there is also a
vectorized numpy path in :mod:`letsearch_spark.operators.topk`
(matmul over Arrow batches); the expression forms below are the
correctness reference.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double_array(v: Column | Sequence[float]) -> Column:
    if isinstance(v, Column):
        return F.transform(v, lambda x: x.cast("double"))
    return F.array(*[F.lit(float(x)).cast("double") for x in v])


def dot_product(a: Column | Sequence[float], b: Column | Sequence[float]) -> Column:
    """Elementwise dot product of two array<numeric> columns (double)."""
    a, b = _as_double_array(a), _as_double_array(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | Sequence[float]) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(
    a: Column | Sequence[float], b: Column | Sequence[float]
) -> Column:
    """Cosine similarity in double precision; 0.0 when either norm is 0.

    This equals the reference's search score (1 - cosine_distance,
    vector_index.rs:141-149).
    """
    num = dot_product(a, b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(num / denom)


def l2_normalize(a: Column | Sequence[float]) -> Column:
    """Unit-normalize an array<numeric> column (zero vector stays zero)."""
    a = _as_double_array(a)
    n = l2_norm(a)
    return F.when(n == 0.0, a).otherwise(F.transform(a, lambda x: x / n))
