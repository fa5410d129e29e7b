"""SparkSession factory with scale-appropriate defaults.

Every knob here is chosen for the 100 TB design point and merely *tested*
on local[N]:

* AQE on: runtime coalescing + skew-join splitting replace hand-tuned
  shuffle partition counts when data sizes vary by 1000x.
* Arrow on: all pandas UDF interchange is columnar (the reference moves
  data engine<->app as Arrow RecordBatches too, collection_actor.rs:434).
* shuffle.partitions defaults to a small local value; on a real cluster
  AQE's coalescing makes the initial number mostly irrelevant as long as
  it is high enough, so callers pass e.g. 2000 there.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "letsearch-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ensure_min_parallelism(df, min_partitions: int | None = None):
    """Round-robin repartition a frame UP to the session's default
    parallelism when its plan currently yields fewer partitions.

    The local/small-file case: a single small parquet file (often one
    row group) scans as ONE partition, so every per-row kernel pass
    downstream (mapInPandas / pandas_udf) runs as a single task and
    serializes a 32-core local session on its Python hot loop. At
    cluster scale real inputs carry >= parallelism splits and this is
    a NO-OP -- no shuffle is ever added on top of a well-split scan,
    so the 100 TB plan shape is unchanged (guide section 2:
    scale-adaptive partitioning derived from the input, not a tuned
    constant).

    Only safe above row-wise deterministic consumers: the repartition
    moves rows between tasks, never changes row values -- callers that
    depend on partition identity (dense key assignment, per-partition
    counters, monotonically_increasing_id) must not use it.

    Applies ONLY to map-only scan chains: probing the partition count
    goes through ``df.rdd``, and under AQE that materializes any
    upstream query stages eagerly at plan-build time -- their shuffles
    would run once here and AGAIN when the real query runs (ADVICE r10).
    A frame whose analyzed plan carries a shuffle-producing operator
    (aggregate, join, window, distinct, sort, repartition) is returned
    unchanged: such plans already have shuffle-partition parallelism,
    so the under-parallel-scan problem this guard exists for cannot
    occur there."""
    sc = df.sparkSession.sparkContext
    target = int(min_partitions or sc.defaultParallelism)
    plan = df._jdf.queryExecution().analyzed().toString()
    shuffling = (
        "Aggregate",
        "Join",
        "Window",
        "Deduplicate",
        "Distinct",
        "Sort",
        "Repartition",
        "GlobalLimit",
    )
    if any(k in plan for k in shuffling):
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
