"""Bucketed-table helpers: shuffle-free co-located joins.

The 100-TB join strategy ladder is broadcast (small side) -> AQE
sort-merge (general) -> BUCKETED sort-merge (both sides huge, joined
repeatedly on the same key). Writing both tables bucketed-and-sorted by
the join key pins identical partitioning on disk, so every subsequent
join on that key is exchange-free AND sort-free: the cost of the shuffle
is paid once at write time and amortized over every downstream join --
the Spark analog of co-located/co-partitioned tables in MPP warehouses.

Bucketed writes go through the session catalog (``saveAsTable``; plain
``.parquet()`` writes cannot record bucketing metadata). Reads come from
``spark.table``.

Two Spark subtleties this module handles/documents:

* one file per bucket: the writer repartitions by the key first --
  multi-file buckets lose their usable sort order;
* eliding the per-join Sort additionally needs
  ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` (since
  Spark 3.0 the bucketed scan hides its sort order by default). Without
  it the join is still exchange-free -- the shuffle, the expensive
  part, is gone either way -- but each side re-sorts within partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 64,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed AND sorted by ``key`` into the catalog.

    ``n_buckets`` should be sized so one bucket of the LARGER table fits
    an executor's memory at the target scale; both join sides must use
    the same bucket count (or an integer multiple) for the exchange-free
    plan."""
    from pyspark.sql import functions as F

    # one output task per bucket => ONE file per bucket: Spark only
    # trusts (and reuses) the on-disk sort order when a bucket is a
    # single file; multi-file buckets get re-sorted in every join
    df = df.repartition(n_buckets, F.col(key))
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With both sides bucketed+sorted by ``key`` at the same bucket count,
    the physical plan is a SortMergeJoin with NO Exchange and NO Sort on
    either side (asserted in tests/test_plans.py)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
