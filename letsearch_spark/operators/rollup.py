"""Hypertable-style time rollup: one pass, several granularities.

The TimescaleDB continuous-aggregate analog for a Spark table: aggregate
an event stream into hour/day/week/... buckets in a SINGLE scan and a
SINGLE shuffle using GROUPING SETS, instead of one groupBy job per
granularity. Output rows are tagged with their granularity so a serving
layer can partition the rollup table by it and prune reads.

Scale notes: grouping sets expand each input row once per set, but the
partial (map-side) hash aggregate runs below the exchange, so the
shuffled volume is ~|distinct (bucket, keys)| summed over granularities
-- the same rows the separate jobs would shuffle, for ONE scan of the
fact table instead of G scans. For incremental maintenance pair this
with the Structured Streaming rollup (streaming/incremental.py
windowed_event_counts) at the finest granularity and re-aggregate
coarser tiers from it.

Only algebraic aggregates (sum/count/min/max/avg-of-sums) make sense
here -- the restriction every continuous-aggregate system imposes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GRANULARITIES = ("minute", "hour", "day", "week", "month", "quarter", "year")


def time_rollup(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    aggs: Sequence[str],
    granularities: Sequence[str] = ("hour", "day"),
    grain_col: str = "grain",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Aggregate ``df`` at several time granularities in one shuffle.

    ``aggs``: SQL aggregate expressions with aliases (e.g.
    ``"count(1) AS n"``, ``"CAST(sum(user_id) AS BIGINT) AS s"``).
    Output: (grain, bucket, *keys, *agg aliases); ``bucket`` is the
    row's date_trunc'd timestamp at its granularity.
    """
    import re

    bad = [g for g in granularities if g not in _GRANULARITIES]
    if bad:
        raise ValueError(f"unknown granularities {bad}; pick from {_GRANULARITIES}")
    if not granularities:
        raise ValueError("need at least one granularity")
    # plain or backtick-quoted aliases both count (`count(1) AS \`n ev\``)
    alias_re = re.compile(r"\s+as\s+(\w+|`(?:[^`]|``)+`)\s*$", re.IGNORECASE)
    agg_aliases = []
    for a in aggs:
        m = alias_re.search(a)
        if m is None:
            raise ValueError(f"aggregate needs an alias: {a!r}")
        alias = m.group(1)
        if alias.startswith("`"):
            alias = alias[1:-1].replace("``", "`")
        agg_aliases.append(alias)
    # the output is (grain, bucket, *keys, *agg aliases): a grain/bucket
    # name colliding with a key or alias would yield duplicate columns
    taken = set(keys) | set(agg_aliases)
    for name, what in ((grain_col, "grain_col"), (bucket_col, "bucket_col")):
        if name in taken:
            raise ValueError(
                f"{what}={name!r} collides with a key or aggregate alias; "
                f"pass a different {what}"
            )

    def q(ident: str) -> str:
        # backtick-quote key identifiers: names with spaces/dots/keywords
        # would otherwise break the generated GROUPING SETS statement
        return "`" + ident.replace("`", "``") + "`"

    spark = df.sparkSession
    with_buckets = df.select(
        "*",
        *[F.date_trunc(g, F.col(ts_col)).alias(f"__b_{g}") for g in granularities],
    )
    view = f"__rollup_{abs(hash((ts_col, tuple(keys), tuple(granularities)))) % 10**9}"
    with_buckets.createOrReplaceTempView(view)

    sets = ", ".join(
        "(" + ", ".join([f"__b_{g}", *[q(k) for k in keys]]) + ")"
        for g in granularities
    )
    bucket_cols = ", ".join(f"__b_{g}" for g in granularities)
    # GROUPING() = 0 marks the set this output row belongs to -- null
    # bucket values can't be trusted for that (a null ts yields a null
    # bucket inside its own set)
    markers = ", ".join(f"grouping(__b_{g}) AS __in_{g}" for g in granularities)
    key_sel = "".join(f"{q(k)}, " for k in keys)
    agged = spark.sql(
        f"SELECT {key_sel}{bucket_cols}, {markers}, {', '.join(aggs)} "
        f"FROM {view} GROUP BY GROUPING SETS ({sets})"
    )

    grain = None
    bucket = None
    for g in granularities:
        cond = F.col(f"__in_{g}") == 0
        grain = F.when(cond, F.lit(g)) if grain is None else grain.when(cond, F.lit(g))
        bucket = (
            F.when(cond, F.col(f"__b_{g}"))
            if bucket is None
            else bucket.when(cond, F.col(f"__b_{g}"))
        )
    drop = [f"__b_{g}" for g in granularities] + [f"__in_{g}" for g in granularities]
    return (
        agged.select(
            grain.alias(grain_col), bucket.alias(bucket_col), "*"
        ).drop(*drop)
    )
