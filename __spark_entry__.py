"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` -- flagship end-to-end semantic search on sf0.001.
``queries()``    -- every implemented operator from SURVEY.md §2 plus the
                    north-star dedup/similarity/text-analysis suite.
``oracle_sql()`` -- DuckDB-equivalent SQL for every query: hand-written
                    SQL twins where expressible, computed VALUES-literal
                    oracles (pure-Python/numpy reference implementations)
                    for the chunker / stub-embed / e2e-search pipelines.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's whole spine (ingest -> dense keys ->
    stub-embed -> cosine top-k -> fetch-back join) on sf0.001."""
    import tempfile

    from pyspark.sql import functions as F

    from letsearch_spark.collection import Collection

    root = tempfile.mkdtemp(prefix="ls_entry_")
    coll = Collection.create(
        spark, root, name="flagship", index_columns=["text"], model_name="stub://16"
    )
    coll.import_parquet("/root/testdata/sf0.001/documents.parquet")
    coll.embed_column("text")
    res = coll.search("text", "spark join query window batch data", limit=10)
    return res.select(
        F.col("key").cast("long").alias("key"),
        F.col("content").cast("string").alias("content"),
        F.col("score").cast("double").alias("score"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from letsearch_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from letsearch_spark.queries import oracles_with_computed

    return oracles_with_computed()
