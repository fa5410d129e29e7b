"""Byte-level BPE (tokenizer_bytebpe.py): lossless pretokenization,
byte<->unicode bijection, exact encode/decode round-trip, distributed
== sequential-twin bit-identity, distinct-pretoken counting, chunker
integration."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from letsearch_spark.tokenizer_bytebpe import (
    ByteBpeModel,
    _BYTE_TO_UNI,
    _UNI_TO_BYTE,
    pretokenize,
    to_byte_symbols,
    token_count_exact_bytebpe,
    train_byte_bpe,
    train_byte_bpe_twin,
)

_SAMPLES = [
    "the quick brown fox jumps over the lazy dog",
    "I'll say we've done it, isn't that GRAND?",
    "tabs\tand\nnewlines  double  spaces ",
    "unicode: 中文 текст émigré naïve \U0001f600\U0001f680",
    "numbers 12345 mixed a1b2c3 under_score __dunder__",
    "punct!!! ...---... (parens) [brackets] {braces} 'quotes'",
    "",
    "   ",
    " nbsp and　ideographic space",
]


def test_pretokenize_lossless():
    """Every character lands in exactly one pretoken:
    ''.join(pretokenize(t)) == t for arbitrary text."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    for t in _SAMPLES:
        assert "".join(pretokenize(t)) == t

    @settings(max_examples=100, deadline=None)
    @given(st.text(max_size=80))
    def check(t):
        assert "".join(pretokenize(t)) == t

    check()


def test_pretoken_branch_reorder_matches_documented_order():
    """The r11 alternation reorder (letter/digit runs first) is
    output-identical to the documented GPT-2 branch order (contraction
    first): the contraction branch only fires at a literal quote, where
    the letter/digit branches can never match. Property-pinned so a
    future edit that breaks the ordering argument fails here."""
    import re as _re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    documented = _re.compile(
        r"'(?:s|t|re|ve|m|ll|d)"
        r"| ?[^\W\d_]+"
        r"| ?\d+"
        r"| ?(?:[^\w\s]|_)+"
        r"|\s+(?!\S)"
        r"|\s+",
        _re.UNICODE,
    )

    tricky = _SAMPLES + [
        "don't we'll I'm you're they've he'd it's",
        " 'quoted' and '' and ' t",
        "a'b 1't _'s '",
        "'re'll'd",
    ]
    for t in tricky:
        assert pretokenize(t) == documented.findall(t)

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=80))
    def check(t):
        assert pretokenize(t) == documented.findall(t)

    check()


def test_byte_unicode_bijection():
    assert len(_BYTE_TO_UNI) == 256
    assert len(set(_BYTE_TO_UNI.values())) == 256
    for b, c in _BYTE_TO_UNI.items():
        assert _UNI_TO_BYTE[c] == b
        # every symbol is a single visible non-space character
        assert len(c) == 1 and not c.isspace()
    # printable ASCII maps to itself (human-readable merge tables)
    assert _BYTE_TO_UNI[ord("A")] == "A"
    assert to_byte_symbols("AB") == "AB"


def test_encode_decode_exact_roundtrip():
    """The byte alphabet's whole point: decode(encode(x)) == x for ANY
    string -- no OOV, no sentinel ambiguity (the word-level model's
    documented '</w>' caveat does not exist here)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    twin = train_byte_bpe_twin(_SAMPLES, vocab_size=300)
    for t in _SAMPLES + ["literal </w> marker", "\x00\x01 control bytes"]:
        assert twin.decode(twin.encode(t)) == t

    @settings(max_examples=60, deadline=None)
    @given(st.text(max_size=60))
    def check(t):
        assert twin.decode(twin.encode(t)) == t

    check()


def test_train_byte_bpe_matches_twin_bitwise(spark, sf_dir):
    """Distributed trainer == sequential twin -- merges, coverage,
    type count -- at two partitionings (exact integer counts +
    deterministic order + the shared merge kernel)."""
    import os

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    texts = [r["text"] or "" for r in docs.select("text").collect()]
    twin = train_byte_bpe_twin(texts, vocab_size=320)
    assert len(twin.merges) > 0
    for parts in (3, 17):
        m = train_byte_bpe(docs.repartition(parts), "text", vocab_size=320)
        assert m.merges == twin.merges
        assert m.pretoken_types == twin.pretoken_types
        assert m.coverage == twin.coverage


def test_token_count_exact_bytebpe_matches_model(spark, sf_dir):
    """The distinct-pretoken distributed count equals the model's own
    sequential count per document; null/empty docs keep a 0 row."""
    import os

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    model = train_byte_bpe(docs, "text", vocab_size=320)
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in token_count_exact_bytebpe(
            docs, "doc_id", "text", model
        ).collect()
    }
    rows = docs.select("doc_id", "text").collect()
    assert len(got) == len(rows)
    for r in rows:
        assert got[r["doc_id"]] == model.token_count(r["text"] or "")

    extra = spark.createDataFrame(
        [(9001, None), (9002, "")], "doc_id long, text string"
    )
    z = {
        r["doc_id"]: r["n_tokens"]
        for r in token_count_exact_bytebpe(
            extra, "doc_id", "text", model
        ).collect()
    }
    assert z == {9001: 0, 9002: 0}


def test_byte_bpe_save_load_and_vocab(tmp_path):
    twin = train_byte_bpe_twin(_SAMPLES, vocab_size=280)
    p = str(tmp_path / "bbpe.json")
    twin.save(p)
    back = ByteBpeModel.load(p)
    assert back.merges == twin.merges
    assert back.coverage == twin.coverage
    v = back.vocab
    assert len(v) == len(set(v))
    assert v[:256] == [  # alphabet first, byte order
        _BYTE_TO_UNI[b] for b in range(256)
    ]
    assert back.token_count(_SAMPLES[0]) == twin.token_count(_SAMPLES[0])


def test_byte_bpe_validation():
    with pytest.raises(ValueError, match="256"):
        train_byte_bpe_twin(_SAMPLES, vocab_size=100)
    with pytest.raises(ValueError, match="no text"):
        train_byte_bpe_twin([""], vocab_size=300)


def test_chunker_byte_bpe_mode(tmp_path):
    """ChunkerConfig(byte_bpe_path=...) counts with the byte-BPE model
    and stays mutually exclusive with the other tokenizer modes."""
    from letsearch_spark.chunker import ChunkerConfig, MarkdownChunker

    twin = train_byte_bpe_twin(_SAMPLES, vocab_size=300)
    p = str(tmp_path / "bbpe.json")
    twin.save(p)
    ch = MarkdownChunker(ChunkerConfig(max_tokens=8, byte_bpe_path=p))
    text = _SAMPLES[0]
    assert ch.count_tokens(text) == twin.token_count(text)
    # the byte-BPE counter drives the split decision: a text above the
    # limit must split (>1 chunk); chunk-boundary semantics themselves
    # are the chunker suite's contract, not this integration test's
    joined = text + "\n\n" + _SAMPLES[1]
    assert ch.count_tokens(joined) > 8
    chunks = ch.chunk(joined)
    assert len(chunks) > 1
    with pytest.raises(ValueError, match="at most one"):
        MarkdownChunker(ChunkerConfig(byte_bpe_path=p, bpe_path=p))


def test_encode_ids_column_roundtrip(spark):
    """encode_ids_column: ids index model.vocab; mapping ids back
    through the vocab and the byte map reproduces the text exactly --
    no unk is possible (total byte alphabet)."""
    from letsearch_spark.tokenizer_bytebpe import encode_ids_column

    twin = train_byte_bpe_twin(_SAMPLES, vocab_size=300)
    vocab = twin.vocab
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_SAMPLES)] + [(99, None)],
        "id long, text string",
    )
    got = {
        r["id"]: r["token_ids"]
        for r in encode_ids_column(df, "text", twin).collect()
    }
    assert got[99] == []
    for i, t in enumerate(_SAMPLES):
        toks = [vocab[j] for j in got[i]]
        assert toks == twin.encode(t)
        assert twin.decode(toks) == t


def test_cli_train_tokenizer_byte_bpe(spark, tmp_path, capsys):
    """CLI train-tokenizer --type byte_bpe saves a loadable model."""
    import json as _json

    from letsearch_spark.cli import build_parser, cmd_add_docs, cmd_train_tokenizer
    from letsearch_spark.collection import Collection

    home = str(tmp_path / "home")
    Collection.create(
        spark, home, name="bb", model_name="stub://16"
    ).add_chunks([s for s in _SAMPLES if s.strip()])
    out = str(tmp_path / "bb.json")
    p = build_parser()
    a = p.parse_args(
        ["--home", home, "--master", "local[4]", "train-tokenizer",
         "--collection", "bb", "--out", out, "--type", "byte_bpe",
         "--vocab-size", "300"]
    )
    assert cmd_train_tokenizer(a) == 0
    info = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["type"] == "byte_bpe" and info["merges"] > 0
    back = ByteBpeModel.load(out)
    assert back.decode(back.encode(_SAMPLES[0])) == _SAMPLES[0]


def test_pretokens_fn_memo_matches_fresh_conversion():
    """r11: _make_pretokens_fn memoizes the pretoken -> byte-symbol
    conversion per closure instance (guide 4.2). The memo must be
    invisible: outputs equal a fresh un-memoized conversion on repeats,
    mixed scripts, and after a forced overflow reset."""
    from letsearch_spark.tokenizer_bytebpe import (
        _BYTE_TO_UNI,
        _PRETOKEN_RE,
        _make_pretokens_fn,
    )

    table = {b: c for b, c in _BYTE_TO_UNI.items()}
    tt = str.maketrans(table)

    def fresh(text):
        return [
            p.encode("utf-8").decode("latin-1").translate(tt)
            for p in _PRETOKEN_RE.findall(text)
        ]

    run = _make_pretokens_fn()
    samples = [
        "hello world hello world",
        "don't stop",
        "héllo wörld 漢字 \U0001f389",
        " leading  and \t mixed \n whitespace ",
        "",
        "a\x00b nul bytes",
    ] * 3  # repeats exercise memo hits
    for s in samples:
        assert run(s) == fresh(s)
    assert run(None) == []
