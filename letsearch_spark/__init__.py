"""letsearch-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of altaidevorg/letsearch (reference snapshot at
/root/reference, v0.1.14), re-expressed Spark-first.

Layout:
    collection.py   -- Collection API (create/import/append/embed/search),
                       the Spark equivalent of the reference's actor system
                       (reference: src/actors/collection_actor.rs).
    chunker.py      -- hierarchical Markdown chunker (reference: src/chunker.rs).
    keys.py         -- dense stable surrogate ``_key`` assignment
                       (reference: collection_actor.rs:176-188 key sequence).
    config.py       -- CollectionConfig with serde-default semantics
                       (reference: src/collection/collection_utils.rs:13-57).
    embedders/      -- stub / ONNX / Gemini embedders + URI dispatch
                       (reference: src/model/).
    functions/      -- vector + text scalar function library (JVM-side
                       Column expressions; the slow-path UDFs live next to
                       them clearly marked).
    operators/      -- top-k search, dedup family, similarity join, ANN.
    sources/        -- JSONL / Parquet / PDF / multimodal binary readers
                       (reference: collection_actor.rs imports, src/pdf.rs).
    streaming/      -- incremental append & index maintenance as Structured
                       Streaming (generalizes reference add-docs semantics).
"""

__version__ = "0.1.0"

from letsearch_spark.session import get_spark  # noqa: F401


def __getattr__(name):
    # lazy convenience export: `from letsearch_spark import Collection`
    # without importing pyspark-heavy modules at package import time
    if name == "Collection":
        from letsearch_spark.collection import Collection

        return Collection
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
