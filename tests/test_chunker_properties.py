"""Property-based chunker tests (hypothesis): invariants that must hold
for ANY input, complementing the reference's example-based tests.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from letsearch_spark.chunker import ChunkerConfig, MarkdownChunker

# words without whitespace; occasionally markdown-ish tokens
word = st.text(
    alphabet=st.characters(blacklist_categories=("Zs", "Cc", "Cs")),
    min_size=1,
    max_size=12,
)
texts = st.lists(
    st.one_of(word, st.sampled_from(["#", "##", "###", "\n", "\n\n", "# H"])),
    min_size=0,
    max_size=80,
).map(lambda ws: " ".join(ws))


@given(texts, st.integers(1, 64), st.integers(0, 10))
@settings(max_examples=200, deadline=None)
def test_chunk_invariants(text, max_tokens, overlap):
    c = MarkdownChunker(ChunkerConfig(max_tokens=max_tokens, overlap_tokens=overlap))
    chunks = c.chunk(text)

    # 1. blank input <=> no chunks
    assert bool(chunks) == bool(text.strip())

    # 2. no chunk is blank
    assert all(ch.strip() for ch in chunks)

    # 3. token budget: every chunk fits within max + overlap (+ small
    #    slack), except single oversized words. The overlap term is
    #    reference-faithful: split_by_paragraphs starts the next chunk
    #    with tail_overlap + para and never re-checks the concatenation
    #    (chunker.rs:220-226), so when overlap_tokens ~ max_tokens a
    #    chunk can exceed max_tokens by up to overlap_tokens.
    for ch in chunks:
        if c.count_tokens(ch) > max_tokens + overlap + 5:
            assert len(ch.split()) == 1

    # 4. content preservation: every input word appears in some chunk
    #    (order within chunks, overlap may duplicate but never drop)
    produced = set()
    for ch in chunks:
        produced.update(ch.split())
    for w in text.split():
        assert w in produced


@given(st.lists(word, min_size=1, max_size=60), st.integers(1, 20))
@settings(max_examples=100, deadline=None)
def test_no_overlap_means_partition(words, max_tokens):
    """With overlap 0 and no paragraph/header structure, the token-split
    chunks form an exact partition of the word sequence."""
    text = " ".join(words)
    c = MarkdownChunker(ChunkerConfig(max_tokens=max_tokens, overlap_tokens=0))
    chunks = c._split_by_tokens(text)
    rejoined = " ".join(chunks).split()
    assert rejoined == text.split()
