"""Dataset snapshot diff: what changed between two corpus versions.

A 100 TB training corpus is rebuilt continuously (new crawls in,
dedup/decontamination rules evolve); the release process needs to
answer "what exactly changed since the last snapshot" without diffing
text by hand -- the per-key added/removed/changed ledger that feeds a
data card (`corpus_report`) and gates a release.

Spark-first shape: content equality is an ``md5`` of the null-tagged
concatenation of the compared columns, computed INSIDE each side's
scan, so only (key, 44-byte hash) pairs ever shuffle into the one
full-outer equi-join -- text never travels. The summary is a groupBy
over the four status literals. At 100 TB both sides bucket/partition
on the key naturally; there is no skew (keys are unique per side).

No reference analog (SURVEY.md §2.7 north-star family); the ledger
shape follows standard data-versioning practice (Delta/LakeFS-style
change summaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one md5 over 'col1=<v>\x01col2=<v>...' with NULL spelled out -- the
# null tag keeps ('a', NULL) distinct from ('aNULL',) style collisions
_SEP = "\x01"
_NULL = "\x00NULL\x00"


def _content_hash(cols: list[str]):
    parts = []
    for c in cols:
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit(_NULL)))
    return F.md5(F.concat_ws(_SEP, *parts))


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    compare_cols: list[str],
    status_col: str = "status",
) -> DataFrame:
    """Per-key change ledger between two snapshots.

    Returns (key_col, status) with status in
    {'added', 'removed', 'changed', 'unchanged'}:

    - ``added``     -- key only in ``new``
    - ``removed``   -- key only in ``old``
    - ``changed``   -- key in both, any compared column differs
    - ``unchanged`` -- key in both, all compared columns equal

    ``compare_cols`` are hashed scan-side (md5 of a null-tagged
    concatenation), so the join carries hashes, not content. Keys must
    be unique within each snapshot -- duplicate keys would fan out the
    join; callers with multi-row keys should pre-aggregate.
    """
    if not compare_cols:
        raise ValueError("compare_cols must name at least one column")
    o = old.select(
        F.col(key_col).alias("__k"),
        _content_hash(compare_cols).alias("__oh"),
    )
    n = new.select(
        F.col(key_col).alias("__k"),
        _content_hash(compare_cols).alias("__nh"),
    )
    joined = o.join(n, "__k", "full_outer")
    status = (
        F.when(F.col("__oh").isNull(), F.lit("added"))
        .when(F.col("__nh").isNull(), F.lit("removed"))
        .when(F.col("__oh") != F.col("__nh"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        F.col("__k").alias(key_col), status.alias(status_col)
    )


def dataset_diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    compare_cols: list[str],
) -> DataFrame:
    """(status, n) counts of :func:`dataset_diff` -- the four-row
    release-gate summary (a groupBy over four literals; the join's
    output never leaves the cluster)."""
    return (
        dataset_diff(old, new, key_col, compare_cols)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )
