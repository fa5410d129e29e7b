"""Deterministic hash-based sampling and train/val/test splitting.

North-star training-data-pipeline operators (not in the reference,
SURVEY.md §2.7). The scale-correct way to sample 100 TB is NOT
``df.sample()`` -- RNG sampling changes with partitioning, retries, and
engine version, so reruns and downstream joins disagree. Hashing a stable
key gives a sample/split that is:

* reproducible across engines (the md5 formula is replicated in the
  DuckDB oracle and hash-matches exactly),
* stable under repartitioning, task retries, and appends (a doc keeps
  its split forever -- no train/test leakage when the corpus grows),
* group-aware for free (hash the *group* key, e.g. source domain or url
  host, to keep whole groups on one side of the split).

Both are pure map-side column expressions: zero shuffles, fully
codegen'd, pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from letsearch_spark.operators.dedup import md5_60

_BUCKETS = 1_000_000


def hash_bucket(key: Column, seed: int = 42, buckets: int = _BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets) from a key column + seed."""
    return md5_60(F.concat(key.cast("string"), F.lit(f"#{seed}"))) % buckets


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash (see module doc)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = int(round(fraction * _BUCKETS))
    return df.where(hash_bucket(F.col(key_col), seed) < cut)


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a split label by key hash; weights must sum to 1.

    Rows with equal ``key_col`` always land in the same split (hash the
    group key for leakage-free grouped splits)."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = hash_bucket(F.col(key_col), seed)
    expr = None
    acc = 0.0
    *head, (last_name, _) = list(weights.items())
    for name, wgt in head:
        acc += wgt
        cond = bucket < int(round(acc * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(last_name) if expr is None else expr.otherwise(last_name)
    return df.withColumn(split_col, expr)
