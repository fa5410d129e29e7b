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


def test_tokenizer_fertility_matches_hand_computation(spark):
    """tokenizer_fertility (r9): one-row corpus diagnostic from any
    (id, n_tokens) table -- exact integer micro-unit ratios, null texts
    count zero, and the three trainer families plug in unchanged."""
    from letsearch_spark.operators.vocab import tokenizer_fertility
    from letsearch_spark.tokenizer_bytebpe import (
        token_count_exact_bytebpe,
        train_byte_bpe_twin,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "unicode 中文 here"),
            (3, None),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    twin = train_byte_bpe_twin(
        ["the quick brown fox", "unicode 中文 here"], vocab_size=300
    )
    counts = token_count_exact_bytebpe(docs, "doc_id", "text", twin)
    row = tokenizer_fertility(docs, counts).first()

    texts = {1: "the quick brown fox", 2: "unicode 中文 here", 3: "", 4: ""}
    n_words = sum(len(t.split()) for t in texts.values())
    n_bytes = sum(len(t.encode("utf-8")) for t in texts.values())
    n_chars = sum(len(t) for t in texts.values())
    n_tokens = sum(twin.token_count(t) for t in texts.values())
    assert row["n_docs"] == 4
    assert row["n_words"] == n_words
    assert row["n_bytes"] == n_bytes
    assert row["n_chars"] == n_chars
    assert row["n_tokens"] == n_tokens
    assert row["fertility_micro"] == n_tokens * 1_000_000 // n_words
    assert row["bytes_per_token_micro"] == n_bytes * 1_000_000 // n_tokens
    assert row["chars_per_token_micro"] == n_chars * 1_000_000 // n_tokens


def test_tokenizer_fertility_edge_semantics(spark):
    """r9 third-review catches: (1) the micro floor is EXACT even when
    the quotient's fraction rounds up at decimal scale 6 (Spark decimal
    division is HALF_UP -- 1998996/2000999 must floor to 998998, not
    999); (2) an empty counts table yields uniform zeros, never a
    mixed NULL/0 row."""
    from letsearch_spark.operators.vocab import tokenizer_fertility

    # (1) adversarial ratio: n_tokens*1e6/n_words fraction ~0.9999995,
    # built from many small docs whose word counts sum to the
    # adversarial denominator
    n_docs = 2001
    words_per_doc = 1000  # 2001 * 1000 = 2_001_000... need 2_000_999
    rows = [(i, " ".join("w" for _ in range(words_per_doc)))
            for i in range(n_docs - 1)]
    rows.append((n_docs - 1, " ".join("w" for _ in range(words_per_doc - 1))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    counts = spark.createDataFrame(
        [(i, 999 if i else 999 + (1998996 - 999 * n_docs)) for i in range(n_docs)],
        "doc_id long, n_tokens long",
    )
    row = tokenizer_fertility(docs, counts).first()
    assert row["n_words"] == 2000999
    assert row["n_tokens"] == 1998996
    assert row["fertility_micro"] == 1998996 * 1_000_000 // 2000999  # 998998

    # (2) empty counts: uniform zeros
    empty = spark.createDataFrame([], "doc_id long, n_tokens long")
    row2 = tokenizer_fertility(docs, empty).first()
    assert row2["n_tokens"] == 0
    assert row2["fertility_micro"] == 0
    assert row2["bytes_per_token_micro"] == 0
    assert row2["chars_per_token_micro"] == 0
