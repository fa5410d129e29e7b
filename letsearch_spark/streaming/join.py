"""Watermarked stream-stream event-time interval join -- the
attribution shape (impression stream x click stream: match events with
the same key where the right event lands within ``max_delay`` after
the left one).

The reference is batch-only (SURVEY.md §2.7 records streaming as
absent); this is the Structured Streaming twin of the batch
operators/range_join.py geometry, built on Spark's native
stream-stream join: both sides carry watermarks and the join condition
carries a bounded time range, which is exactly what lets Spark expire
per-key state instead of buffering both streams forever
(state retention on each side is watermark + max_delay).

Scale: state is the ONLY cost that grows -- the join itself shuffles
both streams on the key like any equi-join. At 100 TB/day the knobs
that matter are ``watermark`` (how late data may arrive; direct
multiplier on state size) and ``max_delay`` (the attribution window);
both bound state per key-and-time, so a 1000-executor run holds only
[watermark + max_delay] worth of each stream in the state store, not
the day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from letsearch_spark.streaming.incremental import ensure_event_time

_JOIN_TYPES = ("inner", "left_outer")


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_time: str,
    right_time: str,
    max_delay: str = "1 hour",
    watermark: str = "10 minutes",
    join_type: str = "inner",
) -> DataFrame:
    """Join two event-time streams on ``key_col`` where the right
    event's time is in ``[left_time, left_time + max_delay]``.

    Works on batch frames too (the same plan minus watermarks is a
    plain range-condition join), which is how the batch-twin test pins
    the streaming semantics. Column names other than ``key_col`` and
    the two time columns must be disjoint between the sides (raises
    otherwise -- Spark would silently produce ambiguous columns).

    ``join_type='left_outer'`` emits unmatched left events with nulls
    once the watermark passes their window -- the "impression with no
    click" record; Spark requires the watermark to be on the OUTER
    side for that, which this arrangement satisfies.
    """
    if join_type not in _JOIN_TYPES:
        raise ValueError(
            f"join_type must be one of {_JOIN_TYPES}, got {join_type!r}"
        )
    if left_time == right_time:
        raise ValueError(
            "left_time and right_time must be distinct column names "
            f"(both {left_time!r}); rename one side"
        )
    overlap = (set(left.columns) & set(right.columns)) - {key_col}
    if overlap:
        raise ValueError(
            f"non-key columns {sorted(overlap)} exist on both sides; "
            "rename them (the join output would be ambiguous)"
        )

    l, _ = ensure_event_time(left, left_time)
    r, _ = ensure_event_time(right, right_time)
    if l.isStreaming:
        l = l.withWatermark(left_time, watermark)
    if r.isStreaming:
        r = r.withWatermark(right_time, watermark)
    l = l.alias("l")
    r = r.alias("r")
    cond = (
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & (F.col(f"r.{right_time}") >= F.col(f"l.{left_time}"))
        & (
            F.col(f"r.{right_time}")
            <= F.col(f"l.{left_time}") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    joined = l.join(r, cond, "leftOuter" if join_type == "left_outer" else "inner")
    right_cols = [
        F.col(f"r.{c}").alias(c) for c in right.columns if c != key_col
    ]
    return joined.select(
        F.col(f"l.{key_col}").alias(key_col),
        *[F.col(f"l.{c}").alias(c) for c in left.columns if c != key_col],
        *right_cols,
    )
