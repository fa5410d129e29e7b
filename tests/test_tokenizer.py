"""Distributed BPE tokenizer: training determinism, the classic
Sennrich merge order, round-trips, and the distinct-word-cost exact
counter vs a driver-side twin."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from letsearch_spark.tokenizer import (
    BpeModel,
    token_count_exact,
    tokenize_column,
    train_bpe,
    word_counts,
)

# Sennrich et al. 2016 example corpus as (word, count) weights
SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def _sennrich_df(spark):
    rows = []
    for i, (w, c) in enumerate(SENNRICH.items()):
        rows.append((i, " ".join([w] * c)))
    return spark.createDataFrame(rows, "doc_id long, text string")


# One shared vocab-30 Sennrich model (suite-latency: six tests trained
# the identical (corpus, config) pair back to back).
@pytest.fixture(scope="module")
def bpe30(spark):
    return train_bpe(_sennrich_df(spark), "text", vocab_size=30)


def test_word_counts_distributed(spark):
    df = spark.createDataFrame(
        [(1, "a b  a"), (2, "  b\tc "), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    got = {r["word"]: r["count"] for r in word_counts(df, "text").collect()}
    assert got == {"a": 2, "b": 2, "c": 1}


def test_train_bpe_sennrich_merge_order(spark):
    """The canonical example, adapted to the last-char+'</w>' symbol
    representation: ('e','s') at weight 9, ('es','t</w>') at 9,
    ('l','o') at 7, ('e','w') at 6 (tie with ('n','e') and
    ('w','est</w>') broken lexicographically), ('ew','est</w>') at 6 --
    exact order pinned by the count-desc / pair-asc tie-break."""
    model = train_bpe(_sennrich_df(spark), "text", vocab_size=100)
    assert model.merges[:5] == [
        ("e", "s"),
        ("es", "t</w>"),
        ("l", "o"),
        ("e", "w"),
        ("ew", "est</w>"),
    ]
    assert model.coverage == 1.0
    assert model.word_types == 4


def test_train_bpe_deterministic_under_repartition(spark):
    df = _sennrich_df(spark)
    m1 = train_bpe(df, "text", vocab_size=40)
    m2 = train_bpe(df.repartition(7), "text", vocab_size=40)
    assert m1.merges == m2.merges
    assert m1.alphabet == m2.alphabet


def test_vocab_size_budget_respected(spark):
    model = train_bpe(_sennrich_df(spark), "text", vocab_size=14)
    # alphabet is 11 symbols (d e i l n o s w + r</w> t</w> w</w>),
    # so at most 3 merges fit the budget
    assert len(model.alphabet) == 11
    assert len(model.merges) <= 3
    assert len(model.vocab) <= 14
    small = train_bpe(_sennrich_df(spark), "text", vocab_size=1)
    assert small.merges == []  # alphabet alone exceeds the budget


def test_encode_round_trip_and_counts(spark, bpe30):
    model = bpe30
    for w in list(SENNRICH) + ["unseen", "lowestest", "x"]:
        toks = model.encode_word(w)
        assert "".join(toks) == w + "</w>"
    text = "newest lower low"
    assert model.decode(model.encode(text)) == text
    assert model.token_count(text) == sum(
        len(model.encode_word(w)) for w in text.split()
    )
    assert model.encode_word("") == []
    assert model.token_count("   ") == 0


def test_save_load_round_trip(spark, tmp_path, bpe30):
    model = bpe30
    p = str(tmp_path / "bpe.json")
    model.save(p)
    loaded = BpeModel.load(p)
    assert loaded == model
    assert loaded.encode("newest low") == model.encode("newest low")


def test_max_word_types_cap_reports_coverage(spark):
    # cap keeps the 2 most frequent types (newest=6, low=5) of 16 total
    model = train_bpe(_sennrich_df(spark), "text", vocab_size=50, max_word_types=2)
    assert model.word_types == 2
    assert model.coverage == pytest.approx(11 / 16)


def test_min_count_filters_rare_types(spark):
    # min_count=3 keeps low(5), newest(6), widest(3); drops lower(2)
    model = train_bpe(_sennrich_df(spark), "text", vocab_size=50, min_count=3)
    assert model.word_types == 3
    model2 = train_bpe(_sennrich_df(spark), "text", vocab_size=50, min_count=2)
    assert model2.word_types == 4


def test_token_count_exact_matches_driver_twin(spark, bpe30):
    docs = spark.createDataFrame(
        [
            (1, "the newest lower bound is the lowest"),
            (2, "wide widest low low low"),
            (3, ""),
            (4, None),
            (5, "   "),
        ],
        "doc_id long, text string",
    )
    model = bpe30
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in token_count_exact(docs, "doc_id", "text", model).collect()
    }
    want = {
        r["doc_id"]: model.token_count(r["text"] or "")
        for r in docs.collect()
    }
    assert got == want
    assert got[3] == 0 and got[4] == 0 and got[5] == 0


def test_token_count_exact_stable_under_repartition(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    model = train_bpe(docs, "text", vocab_size=300, max_word_types=5000)
    a = token_count_exact(docs, "doc_id", "text", model).collect()
    b = token_count_exact(docs.repartition(13), "doc_id", "text", model).collect()
    assert sorted((r["doc_id"], r["n_tokens"]) for r in a) == sorted(
        (r["doc_id"], r["n_tokens"]) for r in b
    )


def test_tokenize_column_matches_encode(spark, bpe30):
    model = bpe30
    docs = spark.createDataFrame(
        [(1, "newest low"), (2, None), (3, "")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["tokens"]
        for r in tokenize_column(docs, "text", model).collect()
    }
    assert got[1] == model.encode("newest low")
    assert got[2] == [] and got[3] == []


def test_token_count_exact_plan_broadcasts_type_table(spark):
    """The per-type length table must come back via a BROADCAST join --
    a shuffled join on the word column would defeat the design."""
    docs = spark.createDataFrame([(1, "a b"), (2, "b c")], "doc_id long, text string")
    model = train_bpe(docs, "text", vocab_size=20)
    plan = token_count_exact(docs, "doc_id", "text", model)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_train_bpe_raises_on_empty_corpus(spark):
    empty = spark.createDataFrame([(1, ""), (2, None)], "doc_id long, text string")
    with pytest.raises(ValueError, match="no words"):
        train_bpe(empty, "text", vocab_size=10)
    with pytest.raises(ValueError, match="vocab_size"):
        train_bpe(empty, "text", vocab_size=0)


def test_pipeline_token_count_col_integration(spark, sf_dir):
    """BPE-exact counts feed pack_sequences through the pipeline's
    token_count_col hook and change the layout vs the 1.3x approx."""
    from letsearch_spark.operators.pack import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    model = train_bpe(docs, "text", vocab_size=500, max_word_types=10000)
    counted = docs.join(
        token_count_exact(docs, "doc_id", "text", model), "doc_id"
    )
    packed = pack_sequences(counted, "doc_id", "n_tokens", seq_len=128, num_shards=4)
    total_spans = packed.agg(F.sum("tok_len").alias("s")).first()["s"]
    total_tokens = counted.where(F.col("n_tokens") > 0).agg(
        F.sum("n_tokens").alias("s")
    ).first()["s"]
    assert total_spans == total_tokens


def test_chunker_bpe_mode(spark, tmp_path, bpe30):
    """ChunkerConfig.bpe_path drives T4 counting with the trained model:
    boundaries respect the exact BPE budget, and setting both tokenizer
    sources is rejected."""
    from letsearch_spark.chunker import ChunkerConfig, MarkdownChunker, chunk_column

    model = bpe30
    p = str(tmp_path / "bpe.json")
    model.save(p)

    with pytest.raises(ValueError, match="at most one"):
        MarkdownChunker(ChunkerConfig(tokenizer_path="x", bpe_path=p))

    cfg = ChunkerConfig(max_tokens=4, overlap_tokens=0, bpe_path=p)
    ck = MarkdownChunker(cfg)
    assert ck.count_tokens("newest low") == model.token_count("newest low")
    text = "newest lower low widest newest low lower widest"
    chunks = ck.chunk(text)
    assert len(chunks) > 1
    for c in chunks:
        # every chunk respects the exact budget except oversize single
        # words (guaranteed-advance rule) -- none exist in this corpus
        assert model.token_count(c) <= 4
    assert " ".join(chunks).split() == text.split()  # nothing lost

    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_column(docs, "text", cfg).collect()
    assert [r["chunk"] for r in sorted(rows, key=lambda r: r["chunk_idx"])] == chunks


def test_unicode_whitespace_parity(spark, bpe30):
    """Java \\s is ASCII-only; the Python-side splits must match it, so
    NBSP-joined words stay ONE word on BOTH engines (the scraped-HTML
    case where str.split() would disagree with the distributed count)."""
    model = bpe30
    text = "tel\u00a0aviv low"  # NBSP joint
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = token_count_exact(docs, "doc_id", "text", model).first()["n_tokens"]
    assert got == model.token_count(text)
    # NBSP did NOT split: 2 words, not 3
    from letsearch_spark.tokenizer import split_text

    assert split_text(text) == ["tel\u00a0aviv", "low"]
    toks = tokenize_column(docs, "text", model).first()["tokens"]
    assert toks == model.encode(text)


def test_coverage_counts_min_count_drops(spark):
    """Occurrences removed by min_count must show up in coverage: low(5)
    + newest(6) + widest(3) = 14 of 16 total when lower(2) is cut."""
    model = train_bpe(_sennrich_df(spark), "text", vocab_size=50, min_count=3)
    assert model.coverage == pytest.approx(14 / 16)


# ---------------------------------------------------- property tests


def test_bpe_properties_random_words(spark):
    """Hypothesis over the pure-Python model (one Spark training, many
    driver-side examples): for ANY word -- including ones the trainer
    never saw, unicode, punctuation -- the symbol concatenation equals
    word + sentinel, counts are additive over whitespace joins, and
    encode_word is idempotent w.r.t. the cache."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    model = train_bpe(_sennrich_df(spark), "text", vocab_size=40)

    word = st.text(
        st.characters(
            blacklist_categories=("Zs", "Cc", "Cs"), blacklist_characters=" "
        ),
        min_size=1,
        max_size=24,
    )

    @settings(max_examples=300, deadline=None)
    @given(st.lists(word, min_size=0, max_size=8))
    def check(words):
        text = " ".join(words)
        toks = model.encode(text)
        assert "".join(toks) == "".join(w + "</w>" for w in words if w)
        assert model.token_count(text) == len(toks)
        # additivity: count(text) == sum of per-word counts
        assert model.token_count(text) == sum(
            len(model.encode_word(w)) for w in words if w
        )
        for w in words:
            assert model.encode_word(w) == model.encode_word(w)

    check()


def test_decode_sentinel_caveat_documented():
    """The documented in-band-sentinel ambiguity: decode of a word
    whose text contains the literal marker produces a spurious space.
    Encoding and counting stay exact."""
    m = BpeModel(merges=[], alphabet=["a"], word_types=0, coverage=0.0)
    w = "a</w>b"
    toks = m.encode_word(w)
    assert "".join(toks) == w + "</w>"  # encode round-trips at symbol level
    assert m.decode(toks) != w  # decode cannot distinguish data from marker


def test_encode_ids_column_matches_encode_and_unks(spark, bpe30):
    """Token ids are the positions of model.encode's tokens in
    model.vocab; symbols the trainer never saw (an emoji word) map to
    the unk id; null/empty text encodes to an empty array."""
    from letsearch_spark.tokenizer import encode_ids_column

    model = bpe30
    id_of = {t: i for i, t in enumerate(model.vocab)}
    docs = spark.createDataFrame(
        [(1, "newest low"), (2, None), (3, ""), (4, "low ☃")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["token_ids"]
        for r in encode_ids_column(docs, "text", model).collect()
    }
    assert got[1] == [id_of[t] for t in model.encode("newest low")]
    assert got[2] == [] and got[3] == []
    # the snowman word's symbols are outside the trained alphabet
    snow = got[4]
    assert snow[: len(model.encode_word("low"))] == [
        id_of[t] for t in model.encode_word("low")
    ]
    assert snow[-1] == -1  # unk id for the unseen symbol
