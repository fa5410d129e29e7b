"""Skew-mitigation helpers for hot-key joins and aggregations.

AQE's skew-join splitting handles sort-merge skew automatically
(spark.sql.adaptive.skewJoin.enabled is on in session.py); these
helpers cover the cases AQE can't: hot keys in *broadcast-ineligible*
joins and high-cardinality-per-key aggregations.

* :func:`salted_join` -- classic n-way salting: the skewed (large) side
  gets a random salt in [0, n); the small side is exploded n times; the
  join key becomes (key, salt). Correct for inner/left joins where the
  right side is the exploded one.
* :func:`two_stage_agg` -- aggregate first on (key, salt), then on key.
  Turns one hot reducer into n + 1 balanced ones for algebraic
  aggregates (sum/count/min/max).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` (skewed) with ``small`` on column ``on`` using n-way
    salting. ``small`` is replicated n_salts times -- keep it dimension-
    sized. Output columns = big's + small's minus the duplicate key.

    Only inner/left joins are correct under salting (an unmatched
    small-side row would surface once per salt in right/full joins)."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}"
        )
    salted_big = big.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    salts = F.explode(
        F.array(*[F.lit(i) for i in range(n_salts)])
    ).alias("__salt")
    salted_small = small.select("*", salts)
    out = salted_big.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")


def two_stage_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage algebraic aggregation: partial on (keys..., salt), final
    on keys. ``aggs`` maps column -> one of sum/count/min/max.

    Equivalent result to a direct groupBy (tested), but a key with 10^9
    rows becomes n_salts partial groups instead of one hot reducer.
    """
    merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for fn in aggs.values():
        if fn not in merge:
            raise ValueError(f"two_stage_agg supports {sorted(merge)}, got {fn!r}")

    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[first[fn](c).alias(f"__p_{c}") for c, fn in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[
            merge[fn](f"__p_{c}").alias(f"{fn}_{c}")
            for c, fn in aggs.items()
        ]
    )
