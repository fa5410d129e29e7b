"""As-of (point-in-time) join -- an operator Spark lacks natively.

Not in the reference (SURVEY.md §2.7: no user-facing joins); this is a
north-star training-data-pipeline operator: feature attachment without
temporal leakage ("the most recent right-side row at or before each left
event"), the join every point-in-time-correct feature pipeline needs.

Spark-first plan (NOT a range cross-join): tag both sides, UNION into one
frame, and resolve each left row's match with a window running over
(key, time). Cost = exactly ONE shuffle on the join key + a sort within
partitions -- the same profile as a regular join, independent of how many
right rows precede each left row. The naive alternative
(``l.join(r, key).where(rt <= lt)`` + argmax) explodes to O(|l| x |r|)
rows per key before aggregating; at 100 TB with years of history per key
that's the difference between a working plan and an OOM.

The right-side payload travels as ONE struct column filled with
``last(..., ignorenulls=True)`` so the matched row is atomic -- per-column
fills could stitch values from different right rows when payloads contain
nulls.

DuckDB expresses this as ``ASOF JOIN`` (the oracle for
``events_asof_last_order`` in queries.py); pandas as ``merge_asof``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    by_left: str,
    by_right: str,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    right_ts_out: str | None = None,
    how: str = "left",
) -> DataFrame:
    """For each left row, attach the single right row with the closest
    ``right_ts`` at-or-before (``direction='backward'``) or at-or-after
    (``'forward'``) ``left_ts`` within the same key group.

    Ties on ``right_ts`` within a key resolve to the LAST right row in
    the frame's sort order -- deterministic if callers pre-dedup the right
    side per (key, ts) (recommended; mirrors DuckDB ASOF which assumes
    unique timestamps per key).

    ``tolerance_seconds``: unmatched if |left_ts - right_ts| exceeds it
    (fractional seconds honored -- the comparison runs on epoch
    microseconds, not whole seconds).
    ``right_ts_out``: include the matched right timestamp under this name.
    ``how``: 'left' keeps unmatched left rows (payload nulls); 'inner'
    drops them.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    payload = [c for c in right.columns if c not in (right_ts, by_right)]
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"column name clash between sides: {sorted(clash)}")

    r_struct = F.struct(
        *[F.col(c) for c in payload], F.col(right_ts).alias("__rt")
    )
    r_side = right.select(
        F.col(by_right).alias("__by"),
        F.col(right_ts).alias("__t"),
        F.lit(1).alias("__is_right"),
        r_struct.alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    l_side = left.select(
        F.col(by_left).alias("__by"),
        F.col(left_ts).alias("__t"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(r_side.schema["__r"].dataType).alias("__r"),
        *[F.col(c) for c in left.columns],
    )
    both = l_side.unionByName(r_side)

    if direction == "backward":
        # right rows sort BEFORE left rows at equal ts => ts-equal matches
        # are visible to the running last()
        w = (
            Window.partitionBy("__by")
            .orderBy(F.col("__t").asc(), F.col("__is_right").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = F.last("__r", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy("__by")
            .orderBy(F.col("__t").asc(), F.col("__is_right").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        filled = F.first("__r", ignorenulls=True).over(w)

    out = (
        both.withColumn("__m", filled)
        .where(F.col("__is_right") == 0)
    )
    if tolerance_seconds is not None:
        # microsecond-precision delta: unix_timestamp() truncates to whole
        # seconds and would mis-classify sub-second gaps at the boundary
        delta_us = F.abs(
            F.unix_micros(F.col("__t").cast("timestamp"))
            - F.unix_micros(F.col("__m.__rt").cast("timestamp"))
        )
        tol_us = int(round(tolerance_seconds * 1_000_000))
        out = out.withColumn(
            "__m", F.when(delta_us <= tol_us, F.col("__m"))
        )
    if how == "inner":
        out = out.where(F.col("__m").isNotNull())
    cols = [F.col(c) for c in left.columns]
    cols += [F.col(f"__m.{c}").alias(c) for c in payload]
    if right_ts_out is not None:
        cols.append(F.col("__m.__rt").alias(right_ts_out))
    return out.select(*cols)
