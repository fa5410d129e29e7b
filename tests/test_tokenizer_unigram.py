"""Unigram-LM tokenizer (tokenizer_unigram.py): distributed EM == the
sequential twin bit-for-bit, Viterbi application, scale-shape plans."""

import os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from letsearch_spark.tokenizer import split_text
from letsearch_spark.tokenizer_unigram import (
    UnigramModel,
    token_count_exact_unigram,
    tokenize_column_unigram,
    train_unigram,
    train_unigram_twin,
)


def _docs(spark, sf_dir, n=80):
    return (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .where(F.col("doc_id") < n)
        .select("doc_id", "text")
    )


# Shared trained models (suite-latency: each distributed EM training is
# ~8-14 s of Spark jobs; five tests used identical (corpus, config)
# pairs, so train each distinct pair once per module).
@pytest.fixture(scope="module")
def model30(spark, sf_dir):
    return train_unigram(_docs(spark, sf_dir, n=30), "text", vocab_size=100)


@pytest.fixture(scope="module")
def model20(spark, sf_dir):
    return train_unigram(_docs(spark, sf_dir, n=20), "text", vocab_size=100)


@pytest.mark.deep  # auditor tier (pytest.ini): EM twin replay; token_count_unigram's oracle is computed FROM the model each round
def test_distributed_em_matches_twin_bitwise(spark, sf_dir):
    """The whole point of the fixed-point E-step: the distributed model
    and the sequential twin are EQUAL -- every piece, every log-prob,
    to the last bit -- regardless of how Spark partitioned the types."""
    docs = _docs(spark, sf_dir)
    model = train_unigram(docs, "text", vocab_size=120, em_iters=2)

    wc = Counter(
        w for r in docs.collect() for w in split_text(r["text"] or "")
    )
    twin = train_unigram_twin(sorted(wc.items()), vocab_size=120, em_iters=2)
    assert model.pieces == twin.pieces
    assert model.unk_logp == twin.unk_logp
    assert model.word_types == len(wc)


def test_training_is_repartition_invariant(spark, sf_dir, model30):
    # one arm reuses the shared n=30 model; the repartitioned arm must
    # train to the identical pieces (same corpus, same config)
    docs = _docs(spark, sf_dir, n=30)
    b = train_unigram(docs.repartition(7), "text", vocab_size=100)
    assert model30.pieces == b.pieces


def test_vocab_contains_alphabet_and_multi_pieces(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    model = train_unigram(docs, "text", vocab_size=150)
    chars = {
        ch
        for r in docs.collect()
        for w in split_text(r["text"] or "")
        for ch in w
    }
    vocab = set(model.vocab)
    assert chars <= vocab  # closure: every observed char is a piece
    multi = [p for p in vocab if len(p) > 1]
    assert multi  # EM kept useful multi-char pieces
    # the corpus repeats words heavily: counts must beat per-char
    text = docs.first()["text"]
    assert model.token_count(text) < sum(len(w) for w in split_text(text))


def test_segmentation_tiles_exactly_and_handles_unknowns(model30):
    model = model30
    for word in ("customer", "supercalifragilistic", "query42"):
        seg = model.encode_word(word)
        assert "".join(seg) == word
    # characters the trainer never saw fall back to 1-char unk pieces
    seg = model.encode_word("日本語")
    assert "".join(seg) == "日本語" and len(seg) == 3
    assert model.encode_word("") == []
    assert model.token_count("") == 0


def test_token_count_exact_matches_driver_model(spark, sf_dir):
    docs = _docs(spark, sf_dir, n=40)
    model = train_unigram(docs, "text", vocab_size=120)
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in token_count_exact_unigram(docs, "doc_id", "text", model).collect()
    }
    for r in docs.collect():
        assert got[r["doc_id"]] == model.token_count(r["text"] or ""), r["doc_id"]


def test_tokenize_column_tiles_text(spark, sf_dir, model20):
    docs = _docs(spark, sf_dir, n=20)
    model = model20
    out = tokenize_column_unigram(docs, "text", model).collect()
    for r in out:
        assert "".join(r["tokens"]) == "".join(split_text(r["text"] or ""))


def test_save_load_roundtrip(tmp_path, model30):
    model = model30
    path = str(tmp_path / "unigram.json")
    model.save(path)
    loaded = UnigramModel.load(path)
    assert loaded.pieces == model.pieces
    assert loaded.unk_logp == model.unk_logp
    assert loaded.token_count("customer query") == model.token_count(
        "customer query"
    )


def test_validation(spark, sf_dir):
    docs = _docs(spark, sf_dir, n=5)
    with pytest.raises(ValueError):
        train_unigram(docs, "text", vocab_size=0)
    with pytest.raises(ValueError):
        train_unigram(docs, "text", vocab_size=10, max_piece_len=0)
    with pytest.raises(ValueError):
        train_unigram_twin([], vocab_size=10)
    empty = spark.createDataFrame([(1, " ")], "doc_id long, text string")
    with pytest.raises(ValueError):
        train_unigram(empty, "text", vocab_size=10)


def test_encode_ids_column_roundtrip(spark, sf_dir, model20):
    """IDs index model.vocab; mapping ids back to pieces reproduces the
    string tokenization exactly; unseen chars surface as unk_id."""
    from letsearch_spark.tokenizer_unigram import encode_ids_column_unigram

    docs = _docs(spark, sf_dir, n=20)
    model = model20
    vocab = model.vocab
    out = encode_ids_column_unigram(docs, "text", model).collect()
    for r in out:
        pieces = [vocab[i] for i in r["token_ids"]]
        assert pieces == model.encode(r["text"] or "")
        assert all(i >= 0 for i in r["token_ids"])

    weird = spark.createDataFrame([(1, "ab 日x")], "doc_id long, text string")
    ids = encode_ids_column_unigram(weird, "text", model).first()["token_ids"]
    assert -1 in ids  # the unseen CJK char falls back to unk_id


def test_chunker_unigram_mode(spark, sf_dir, tmp_path, model30):
    """ChunkerConfig.unigram_path drives T4 counting with the trained
    unigram model: boundaries respect the exact Viterbi budget, and
    combining tokenizer sources is rejected."""
    from letsearch_spark.chunker import (
        ChunkerConfig,
        MarkdownChunker,
        chunk_column,
    )

    docs = _docs(spark, sf_dir, n=30)
    model = model30
    p = str(tmp_path / "unigram.json")
    model.save(p)

    with pytest.raises(ValueError, match="at most one"):
        MarkdownChunker(ChunkerConfig(bpe_path="x", unigram_path=p))
    with pytest.raises(ValueError, match="at most one"):
        MarkdownChunker(ChunkerConfig(tokenizer_path="x", unigram_path=p))

    text = " ".join(
        w for r in docs.limit(4).collect() for w in split_text(r["text"] or "")
    )
    budget = max(4, model.token_count(text) // 6)
    cfg = ChunkerConfig(max_tokens=budget, overlap_tokens=0, unigram_path=p)
    ck = MarkdownChunker(cfg)
    assert ck.count_tokens("customer query") == model.token_count(
        "customer query"
    )
    chunks = ck.chunk(text)
    assert len(chunks) > 1
    for c in chunks:
        assert model.token_count(c) <= budget
    assert " ".join(chunks).split() == text.split()  # nothing lost

    dd = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_column(dd, "text", cfg).collect()
    assert [
        r["chunk"] for r in sorted(rows, key=lambda r: r["chunk_idx"])
    ] == chunks


def test_viterbi_tie_break_contract():
    """The documented tie-break (r8, VERDICT r6 #6): lengths scan
    ascending with strict >, so an exact score tie resolves toward the
    SHORTER final piece (more pieces). Hand-built tie: logp('ab') ==
    logp('a') + logp('b') exactly (powers of two, no rounding)."""
    from letsearch_spark.tokenizer_unigram import _make_viterbi_kernel

    seg = _make_viterbi_kernel(max_piece_len=4, unk_logp=-64.0)
    logp = {"a": -1.0, "b": -2.0, "ab": -3.0}
    # the two segmentations of 'ab' score exactly -3.0; shorter final
    # piece ('b') wins
    assert seg("ab", logp) == ["a", "b"]
    # still a real optimizer: make the joint piece strictly better
    assert seg("ab", {**logp, "ab": -2.5}) == ["ab"]


def test_viterbi_adversarial_unicode_fuzz():
    """Seeded fuzz over an adversarial alphabet (combining marks, ZWJ,
    astral-plane emoji, RTL, CJK): every segmentation must tile the
    word exactly, be deterministic, and score equal to a brute-force
    enumeration of ALL segmentations (same left-to-right double sums).
    Pieces are code-point lattices -- no byte-level surprises."""
    import random
    from itertools import combinations

    from letsearch_spark.tokenizer_unigram import _make_viterbi_kernel

    alphabet = [
        "a", "b",
        "́",  # combining acute
        "‍",  # zero-width joiner
        "\U0001f600",  # astral-plane emoji (surrogate pair in UTF-16)
        "א",  # Hebrew alef (RTL)
        "中",  # CJK
    ]
    rng = random.Random(8)
    unk = -32.0
    seg = _make_viterbi_kernel(max_piece_len=3, unk_logp=unk)

    def all_segmentations(word):
        n = len(word)
        for k in range(n):
            for cuts in combinations(range(1, n), k):
                bounds = [0, *cuts, n]
                yield [word[i:j] for i, j in zip(bounds, bounds[1:])]

    def score(parts, logp):
        s = 0.0
        for p in parts:
            lp = logp.get(p)
            if lp is None:
                if len(p) != 1:
                    return None  # unreachable in the kernel's lattice
                lp = unk
            s += lp
        return s

    for trial in range(60):
        word = "".join(rng.choices(alphabet, k=rng.randint(1, 7)))
        # random vocabulary: every substring up to len 3 may get a logp
        logp = {}
        for i in range(len(word)):
            for ln in (1, 2, 3):
                p = word[i : i + ln]
                if len(p) == ln and rng.random() < 0.6:
                    logp[p] = -float(rng.randint(1, 12))
        got = seg(word, logp)
        assert "".join(got) == word, (word, got)
        assert got == seg(word, logp)  # deterministic
        assert all(len(p) <= 3 for p in got)
        best = max(
            s
            for parts in all_segmentations(word)
            if len(max(parts, key=len)) <= 3
            and (s := score(parts, logp)) is not None
        )
        assert score(got, logp) == best, (word, got, best)


def test_seed_alphabet_guard(spark, monkeypatch):
    """The singles collect in _distributed_seed_counts is bounded by
    the corpus alphabet; an input with more distinct code points than
    max(seed_size, _ALPHABET_FLOOR) must raise, not collect (the r8
    explicit-cap guard, VERDICT r6 #7). The floor is monkeypatched low
    so the REAL branch fires without synthesizing 65k+ rows."""
    import letsearch_spark.tokenizer_unigram as tu

    rows = [(chr(0x4E00 + i), 1) for i in range(40)]
    types = spark.createDataFrame(rows, "word string, count long")
    # normal path: alphabet under the cap
    counts = tu._distributed_seed_counts(types, max_piece_len=2, seed_size=10)
    assert all(len(p) <= 2 for p in counts)

    monkeypatch.setattr(tu, "_ALPHABET_FLOOR", 16)
    with pytest.raises(ValueError, match="distinct code points"):
        tu._distributed_seed_counts(types, max_piece_len=2, seed_size=10)
    # seed_size raises the cap back above the alphabet: accepted again
    big_seed = tu._distributed_seed_counts(
        types, max_piece_len=2, seed_size=64
    )
    assert all(len(p) <= 2 for p in big_seed)
