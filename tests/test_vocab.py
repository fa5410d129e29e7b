"""Vocabulary coverage curve (operators/vocab.py)."""

import pytest
from pyspark.sql import functions as F


def test_vocab_coverage_known_corpus(spark):
    """Hand-computable corpus: frequencies a:4 b:2 c:1 d:1 (8 tokens).

    Top-1 covers 4/8; top-2 covers 6/8; top-3 covers 7/8 (tiebreak c<d);
    top-10 clamps to the 4 existing types."""
    from letsearch_spark.operators.vocab import vocab_coverage

    df = spark.createDataFrame(
        [("a a b c",), ("A b a d",)], "text string"
    )
    rows = {
        r["k"]: (
            r["vocab_k"],
            r["covered_tokens"],
            r["total_tokens"],
            r["coverage"],
        )
        for r in vocab_coverage(df, "text", ks=(1, 2, 3, 10)).collect()
    }
    assert rows[1] == (1, 4, 8, 0.5)
    assert rows[2] == (2, 6, 8, 0.75)
    assert rows[3] == (3, 7, 8, 0.875)
    assert rows[10] == (4, 8, 8, 1.0)


def test_vocab_coverage_monotone(spark, sf_dir):
    from letsearch_spark.operators.vocab import vocab_coverage

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = vocab_coverage(docs, "text", ks=(10, 100, 1000)).collect()
    cov = [r["coverage"] for r in rows]
    assert cov == sorted(cov)
    assert all(0.0 < c <= 1.0 for c in cov)
    assert len({r["total_tokens"] for r in rows}) == 1


def test_vocab_coverage_rejects_bad_ks(spark, sf_dir):
    from letsearch_spark.operators.vocab import vocab_coverage

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError, match="ks"):
        vocab_coverage(docs, "text", ks=())
    with pytest.raises(ValueError, match="ks"):
        vocab_coverage(docs, "text", ks=(0,))


def test_vocab_coverage_empty_corpus(spark, sf_dir):
    from letsearch_spark.operators.vocab import vocab_coverage

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(F.lit(False))
    assert vocab_coverage(docs, "text").count() == 0
