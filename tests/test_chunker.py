"""Chunker unit tests ported 1:1 from the reference
(src/chunker.rs:302-441) -- they encode the chunking semantics precisely.
"""

from letsearch_spark.chunker import ChunkerConfig, MarkdownChunker


def chunker(max_tokens, overlap):
    return MarkdownChunker(
        ChunkerConfig(max_tokens=max_tokens, overlap_tokens=overlap)
    )


def test_empty_input():  # chunker.rs:315-320
    c = chunker(512, 0)
    assert c.chunk("") == []
    assert c.chunk("   \n  ") == []


def test_short_text_single_chunk():  # chunker.rs:322-329
    c = chunker(512, 0)
    text = "Hello world this is a short text."
    assert c.chunk(text) == [text]


def test_header_splitting():  # chunker.rs:331-349
    text = "# Section A\n\nContent A.\n\n# Section B\n\nContent B."
    c = chunker(10, 0)
    chunks = c.chunk(text)
    assert len(chunks) >= 2, chunks
    assert any("Section A" in ch for ch in chunks)
    assert any("Section B" in ch for ch in chunks)


def test_paragraph_splitting():  # chunker.rs:351-359
    text = (
        "First paragraph with some words.\n\n"
        "Second paragraph with different words.\n\nThird paragraph."
    )
    c = chunker(3, 0)
    chunks = c.chunk(text)
    assert len(chunks) >= 2, chunks


def test_overlap_tokens():  # chunker.rs:361-372
    text = " ".join(f"word{i}" for i in range(1, 101))
    c = chunker(20, 5)
    chunks = c.chunk(text)
    assert len(chunks) > 1


def test_header_level_detection():  # chunker.rs:374-383
    hl = MarkdownChunker.header_level
    assert hl("# H1") == 1
    assert hl("## H2") == 2
    assert hl("### H3") == 3
    assert hl("#### H4") == 4
    assert hl("#nospace") is None
    assert hl("not a header") is None
    assert hl("") is None


def test_h2_split_within_h1_section():  # chunker.rs:385-393
    text = "# Big Section\n\n## Part One\n\nWords words words.\n\n## Part Two\n\nMore words."
    c = chunker(6, 0)
    chunks = c.chunk(text)
    assert len(chunks) >= 2


def test_all_chunks_within_limit():  # chunker.rs:395-410
    text = (
        "# A\n\nLorem ipsum dolor sit amet.\n\n# B\n\nConsectetur adipiscing "
        "elit.\n\n# C\n\nSed do eiusmod tempor."
    )
    for max_tokens in (5, 10, 50, 200):
        c = chunker(max_tokens, 0)
        for ch in c.chunk(text):
            tok = c.count_tokens(ch)
            assert tok <= max_tokens + 5, f"chunk ({tok} tokens) exceeds {max_tokens}: {ch!r}"


def test_no_infinite_loop_oversized_word():  # chunker.rs:412-422
    long_word = "a" * 500
    text = f"{long_word} short words here {long_word}"
    c = chunker(2, 1)
    chunks = c.chunk(text)
    assert chunks


def test_split_by_tokens_no_overlap():  # chunker.rs:424-440
    text = " ".join(f"w{i}" for i in range(1, 51))
    c = chunker(10, 0)
    chunks = c.chunk(text)
    assert len(chunks) > 1
    for i in range(len(chunks) - 1):
        last = chunks[i].split()[-1]
        first = chunks[i + 1].split()[0]
        assert last != first, f"unexpected overlap at boundary {i}"


def test_empty_header_line_is_header():
    # Rust: header followed by end-of-line counts (chunker.rs:127-129)
    assert MarkdownChunker.header_level("#") == 1
    assert MarkdownChunker.header_level("######") == 6
    assert MarkdownChunker.header_level("#######") is None


def _slow_split_by_tokens(c, text):
    """Reference-faithful slow loop (chunker.rs:236-279) for equivalence
    checks against the arithmetic fast path."""
    words = text.split()
    if not words:
        return []
    chunks, start, n = [], 0, len(words)
    while start < n:
        end = start + 1
        while end < n:
            candidate = " ".join(words[start : end + 1])
            if c.count_tokens(candidate) > c.config.max_tokens:
                break
            end += 1
        chunks.append(" ".join(words[start:end]))
        if c.config.overlap_tokens == 0 or end >= n:
            start = end
        else:
            overlap_words = 0
            tok_count = 0
            for w in reversed(words[:end]):
                w_tokens = c.count_tokens(w)
                if tok_count + w_tokens > c.config.overlap_tokens:
                    break
                tok_count += w_tokens
                overlap_words += 1
            new_start = max(end - overlap_words, 0)
            start = new_start if new_start > start else end
    return chunks


def test_fast_split_matches_slow_split():
    import random

    rng = random.Random(42)
    for trial in range(50):
        n = rng.randint(1, 120)
        text = " ".join(f"w{rng.randint(0, 30)}" for _ in range(n))
        max_tokens = rng.randint(1, 40)
        overlap = rng.choice([0, 1, 2, 3, 5, 10])
        c = chunker(max_tokens, overlap)
        assert c._split_by_tokens_fast(text.split()) == _slow_split_by_tokens(c, text), (
            f"divergence at trial {trial}: max={max_tokens} overlap={overlap}"
        )


def test_token_count_approximation():
    # ceil(words * 1.3), chunker.rs:106-114
    c = chunker(512, 0)
    assert c.count_tokens("one two three") == 4  # ceil(3.9)
    assert c.count_tokens("") == 0
    assert c.count_tokens("word") == 2  # ceil(1.3)


def test_approximation_mode_is_the_parity_mode():
    """The reference counts tokens with `tokie` (chunker.rs:106-114); our
    tokenizer mode uses HF `tokenizers`, whose counts can differ per
    model and shift chunk boundaries. The PARITY contract is therefore
    the approximation mode: it is the default (no tokenizer_path), it is
    bit-exact vs the reference's ceil(words*1.3) fallback, and it is
    what the `chunk_documents` oracle pins. See COVERAGE.md §2.5."""
    from letsearch_spark.chunker import ChunkerConfig, MarkdownChunker

    cfg = ChunkerConfig()
    assert cfg.tokenizer_path is None  # default = approximation mode
    c = MarkdownChunker(cfg)
    assert c._tokenizer is None
    # ceil(words*1.3) across a word-count sweep, incl. the 10/13 edges
    import math

    for n in (0, 1, 2, 3, 9, 10, 11, 13, 100):
        text = " ".join(["w"] * n)
        assert c.count_tokens(text) == math.ceil(n * 1.3)
