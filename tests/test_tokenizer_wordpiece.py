"""WordPiece trainer/encoder (tokenizer_wordpiece.py, r10): Spark-vs-
twin bit-parity, the likelihood-vs-frequency merge rule, greedy
longest-match encoding, the distinct-type counting plan, and
save/load."""

import pytest
from pyspark.sql import functions as F

from letsearch_spark.tokenizer_wordpiece import (
    UNK,
    WordPieceModel,
    _train_wordpiece_from_counts,
    token_count_exact_wordpiece,
    train_wordpiece,
    train_wordpiece_twin,
)

CORPUS = [
    "the theme there then the the",
    "other mother weather the brother",
    "then again the theme holds",
    "weather report says rain rain rain",
    None,
    "",
]


def _texts_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_train_matches_twin_and_partitioning(spark):
    twin = train_wordpiece_twin([t for t in CORPUS], vocab_size=60)
    for nparts in (1, 5):
        m = train_wordpiece(
            _texts_df(spark).repartition(nparts), "text", vocab_size=60
        )
        assert m.vocab == twin.vocab
        assert m.word_types == twin.word_types
        assert abs(m.coverage - twin.coverage) < 1e-12


def test_likelihood_rule_beats_raw_frequency():
    """The WordPiece discriminator: a 10-count pair whose parts are
    everywhere must LOSE to an 8-count pair whose parts occur nowhere
    else -- count/(c_a*c_b) ranks exclusivity, not frequency (the rule
    that separates this trainer from BPE's max-count merge)."""
    wc = [("ab", 10), ("a", 100), ("b", 100), ("cd", 8)]
    # alphabet {a, ##b, b, c, ##d} + [UNK] = 6; vocab 7 buys ONE merge
    m = _train_wordpiece_from_counts(wc, vocab_size=7, coverage=1.0)
    # alphabet: a, b, c(##-free first chars)... symbolized: ab -> a,##b;
    # cd -> c,##d. First merged token must be cd's merge, not ab's.
    merged = [t for t in m.vocab if len(t.replace("##", "")) > 1 and t != UNK]
    assert merged[0] == "cd", m.vocab


def test_greedy_encode_unk_and_guard():
    m = _train_wordpiece_from_counts(
        [("hugging", 5), ("hug", 10), ("pug", 6)], vocab_size=40, coverage=1.0
    )
    assert UNK in m.vocab
    # every trained word tiles exactly
    for w in ("hugging", "hug", "pug"):
        toks = m.encode_word(w)
        assert "".join(t.removeprefix("##") for t in toks) == w
    # unseen alphabet -> [UNK]; decode is the documented lossy inverse
    assert m.encode_word("zebra!") == [UNK]
    assert m.decode(m.encode("hug pug")) == "hug pug"
    # the length guard: a megabyte word costs O(1)
    m2 = WordPieceModel(
        vocab=m.vocab, word_types=3, coverage=1.0, word_max_chars=8
    )
    assert m2.encode_word("hugginghugging") == [UNK]


def test_token_count_exact_matches_model(spark):
    df = _texts_df(spark)
    m = train_wordpiece(df, "text", vocab_size=60)
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in token_count_exact_wordpiece(df, "doc_id", "text", m).collect()
    }
    want = {i: m.token_count(t or "") for i, t in enumerate(CORPUS)}
    assert got == want
    assert got[4] == 0 and got[5] == 0  # null/empty keep 0 rows


def test_save_load_roundtrip(tmp_path):
    m = train_wordpiece_twin(["the theme there"], vocab_size=30)
    p = str(tmp_path / "wp.json")
    m.save(p)
    m2 = WordPieceModel.load(p)
    assert m2.vocab == m.vocab
    assert m2.encode("the theme") == m.encode("the theme")
    with pytest.raises(ValueError, match="not a wordpiece"):
        import json

        bad = str(tmp_path / "bad.json")
        with open(bad, "w") as f:
            json.dump({"type": "bpe"}, f)
        WordPieceModel.load(bad)


def test_vocab_budget_and_validation(spark):
    with pytest.raises(ValueError, match="positive"):
        train_wordpiece(_texts_df(spark), "text", vocab_size=0)
    m = train_wordpiece(_texts_df(spark), "text", vocab_size=25)
    assert len(m.vocab) <= 25
    # non-repeating corpora stop early instead of memorizing hapaxes
    t = train_wordpiece_twin(["alpha beta gamma"], vocab_size=1000)
    assert all(len(v.replace("##", "")) == 1 or v == UNK for v in t.vocab)
