"""Interval (range) join -- the second temporal operator Spark lacks
natively, beside the as-of join (operators/asof.py).

Semantics: attach to each left row every right-side interval of the same
key that contains its timestamp (``start <= ts <= end``). The naive
expression is a join on key plus a range predicate, which Spark executes
as an equi-join on the key followed by a per-key filter; when one key's
history holds many intervals, every (event, interval) pair of that key
materializes before filtering -- quadratic in the hot key.

Scale path (``method='bin'``): discretize the time axis into fixed-width
bins. Each left row lands in exactly one bin; each interval explodes
into the bins it overlaps (bounded by ``max_bins`` as a safety rail for
degenerate intervals). The join becomes a pure equi-join on (key, bin),
and the exact range predicate filters the residue inside each bin pair.
An interval spans few bins when ``bin_width`` is chosen near the typical
interval length, so the blow-up factor is small and bounded, and hot
keys spread over (key x bin) reducers -- the same skew-geometry win as
salting, but deterministic. Results are identical to the naive join
(every qualifying pair shares the left row's bin exactly once).

DuckDB oracles express this as a plain BETWEEN join (queries.py
``events_range_join``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    by_left: str,
    by_right: str,
    method: str = "bin",
    bin_width_seconds: int = 86_400,
    max_bins: int = 1_000,
) -> DataFrame:
    """Inner-join each left row to every containing interval per key.

    Output columns: all of left's, then right's (the right key column is
    dropped when both sides share the key name); other clashes raise.

    ``method='bin'`` (default): equi-join on (key, time bin) + exact
    filter -- the 100-TB shape. ``method='range'``: key equi-join +
    range filter, the oracle-identical naive twin (hot keys go
    quadratic; keep for small sides / verification).

    ``max_bins`` caps how many bins one interval may explode into;
    longer intervals raise rather than silently blowing up the join
    (widen bin_width_seconds instead).
    """
    if method not in ("bin", "range"):
        raise ValueError(f"method must be bin|range, got {method!r}")
    clash = (set(left.columns) & set(right.columns)) - (
        {by_left} if by_left == by_right else set()
    )
    if clash:
        raise ValueError(f"column name clash between sides: {sorted(clash)}")

    l = left.alias("l")
    lts = F.unix_micros(F.col(f"l.{left_ts}").cast("timestamp"))
    rstart = F.unix_micros(F.col(f"r.{right_start}").cast("timestamp"))
    rend = F.unix_micros(F.col(f"r.{right_end}").cast("timestamp"))
    key_eq = F.col(f"l.{by_left}") == F.col(f"r.{by_right}")
    in_range_of = lambda ts: (ts >= rstart) & (ts <= rend)  # noqa: E731

    if method == "range":
        joined = l.join(right.alias("r"), key_eq & in_range_of(lts), "inner")
    else:
        width_us = bin_width_seconds * 1_000_000
        l = left.withColumn(
            "__bin",
            F.floor(F.unix_micros(F.col(left_ts).cast("timestamp")) / width_us),
        ).alias("l")
        start_bin = F.floor(
            F.unix_micros(F.col(right_start).cast("timestamp")) / width_us
        )
        end_bin = F.floor(
            F.unix_micros(F.col(right_end).cast("timestamp")) / width_us
        )
        r = (
            right.withColumn(
                "__bins",
                F.when(
                    (end_bin - start_bin) < max_bins,
                    F.sequence(start_bin, end_bin),
                ).otherwise(
                    F.raise_error(
                        F.lit(
                            f"range_join: interval spans >= {max_bins} bins; "
                            "widen bin_width_seconds"
                        )
                    )
                ),
            )
            .select("*", F.explode("__bins").alias("__bin"))
            .drop("__bins")
            .alias("r")
        )
        joined = l.join(
            r,
            (F.col("l.__bin") == F.col("r.__bin")) & key_eq & in_range_of(lts),
            "inner",
        )

    cols = [F.col(f"l.{c}").alias(c) for c in left.columns]
    cols += [
        F.col(f"r.{c}").alias(c)
        for c in right.columns
        if not (by_left == by_right and c == by_right)
    ]
    return joined.select(*cols)
