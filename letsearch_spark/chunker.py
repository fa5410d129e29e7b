"""Hierarchical Markdown chunker (T1-T4 in SURVEY.md §2.5).

Semantics match the reference implementation exactly
(reference: src/chunker.rs:76-299):

* T1 whole-text passthrough when ``count_tokens(text) <= max_tokens``,
  else split at H1 headers, then H2, H3 recursively
  (``chunk`` / ``split_by_headers`` / ``split_at_level``,
  chunker.rs:76-100,135-175).
* T2 paragraph merge-split on blank lines with greedy accumulation and
  ``tail_overlap`` carry-over (``split_by_paragraphs``, chunker.rs:180-232).
* T3 token-window split with guaranteed-advance guard against oversized
  words (``split_by_tokens``, chunker.rs:236-279).
* T4 token counting: HF ``tokenizers`` when a tokenizer path is given,
  else ``ceil(words * 1.3)`` (``count_tokens``, chunker.rs:106-114).

The chunker is pure Python on purpose: inside Spark it runs as an
Arrow-batched pandas UDF returning ``array<string>`` followed by
``explode`` (see :func:`chunk_column`), so each executor chunks its own
partition -- there is no driver-side loop and no shuffle until the
explode output is consumed.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import pandas as pd  # module-level so pandas_udf type hints resolve

__all__ = ["ChunkerConfig", "MarkdownChunker", "chunk_column"]


@dataclass
class ChunkerConfig:
    """Mirror of the reference ChunkerConfig (chunker.rs:14-37)."""

    max_tokens: int = 512
    overlap_tokens: int = 50
    tokenizer_path: str | None = None
    # a BPE model trained in-repo by letsearch_spark.tokenizer.train_bpe
    # and saved with BpeModel.save -- exact counts with zero external
    # dependencies (mutually exclusive with tokenizer_path)
    bpe_path: str | None = None
    # a unigram-LM model trained in-repo by
    # letsearch_spark.tokenizer_unigram.train_unigram and saved with
    # UnigramModel.save (mutually exclusive with the other two)
    unigram_path: str | None = None
    # a byte-level BPE model trained in-repo by
    # letsearch_spark.tokenizer_bytebpe.train_byte_bpe and saved with
    # ByteBpeModel.save (mutually exclusive with the other three) --
    # the GPT-2-family counting mode: no OOV ever, exact round-trip
    byte_bpe_path: str | None = None


class MarkdownChunker:
    def __init__(self, config: ChunkerConfig | None = None):
        self.config = config or ChunkerConfig()
        self._tokenizer = None
        self._bpe = None
        self._unigram = None
        self._byte_bpe = None
        n_set = sum(
            p is not None
            for p in (
                self.config.tokenizer_path,
                self.config.bpe_path,
                self.config.unigram_path,
                self.config.byte_bpe_path,
            )
        )
        if n_set > 1:
            raise ValueError(
                "set at most one of tokenizer_path / bpe_path / "
                "unigram_path / byte_bpe_path"
            )
        if self.config.byte_bpe_path is not None:
            from letsearch_spark.tokenizer_bytebpe import ByteBpeModel

            self._byte_bpe = ByteBpeModel.load_cached(
                self.config.byte_bpe_path
            )
        if self.config.unigram_path is not None:
            from letsearch_spark.tokenizer_unigram import UnigramModel

            self._unigram = UnigramModel.load_cached(self.config.unigram_path)
        if self.config.bpe_path is not None:
            from letsearch_spark.tokenizer import BpeModel

            # load_cached: chunk_column builds a chunker per Arrow
            # batch; the per-process cache keeps one parsed model (and
            # its warm encode-word cache) instead of re-reading JSON
            # every few thousand rows
            self._bpe = BpeModel.load_cached(self.config.bpe_path)
        if self.config.tokenizer_path is not None:
            try:
                from tokenizers import Tokenizer  # optional dependency
            except ImportError as e:  # pragma: no cover
                raise RuntimeError(
                    f"tokenizer_path={self.config.tokenizer_path!r} requires the "
                    f"'tokenizers' package: {e}"
                )
            self._tokenizer = Tokenizer.from_file(self.config.tokenizer_path)

    # ---- public API ----

    def chunk(self, text: str | None) -> list[str]:
        """Split ``text`` into chunks respecting the token limit
        (chunker.rs:76-100)."""
        if text is None or not text.strip():
            return []
        if self.count_tokens(text) <= self.config.max_tokens:
            return [text]

        chunks: list[str] = []
        for seg in self._split_by_headers(text):
            if not seg.strip():
                continue
            if self.count_tokens(seg) <= self.config.max_tokens:
                chunks.append(seg)
            else:
                chunks.extend(self._split_by_paragraphs(seg))
        return chunks

    def count_tokens(self, text: str) -> int:
        """Tokenizer count, or the ceil(words * 1.3) approximation
        (chunker.rs:106-114)."""
        if self._tokenizer is not None:
            return len(self._tokenizer.encode(text).ids)
        if self._bpe is not None:
            return self._bpe.token_count(text)
        if self._unigram is not None:
            return self._unigram.token_count(text)
        if self._byte_bpe is not None:
            return self._byte_bpe.token_count(text)
        words = len(text.split())
        return math.ceil(words * 1.3)

    # ---- helpers (names/semantics follow chunker.rs) ----

    @staticmethod
    def header_level(line: str) -> int | None:
        """Exact ATX header level of ``line``, or None (chunker.rs:118-131)."""
        if not line.startswith("#"):
            return None
        level = 0
        for c in line:
            if c == "#":
                level += 1
            else:
                break
        if level > 6:
            return None
        # must be followed by a space or end-of-line
        if level == len(line) or line[level] == " ":
            return level
        return None

    def _split_by_headers(self, text: str) -> list[str]:
        """Split at H1/H2/H3 boundaries, recursing into oversized sections
        (chunker.rs:135-155)."""
        for level in (1, 2, 3):
            sections = self._split_at_level(text, level)
            if len(sections) > 1:
                out: list[str] = []
                for sec in sections:
                    if self.count_tokens(sec) > self.config.max_tokens:
                        out.extend(self._split_by_headers(sec))
                    else:
                        out.append(sec)
                return out
        return [text]

    @staticmethod
    def _lines(text: str) -> list[str]:
        # Rust str::lines(): split at \n, strip a trailing \r per line.
        return [ln[:-1] if ln.endswith("\r") else ln for ln in text.split("\n")]

    def _split_at_level(self, text: str, level: int) -> list[str]:
        """Split at exactly-``level`` header lines, keeping each header with
        the section that follows it (chunker.rs:159-175)."""
        sections: list[str] = []
        current: list[str] = []
        has_content = False  # tracks `!current.trim().is_empty()` without O(n^2) joins

        def flush():
            if has_content:
                sections.append("".join(current).rstrip())

        for line in self._lines(text):
            if self.header_level(line) == level and has_content:
                flush()
                current = []
                has_content = False
            current.append(line)
            current.append("\n")
            if not has_content and line.strip():
                has_content = True
        flush()
        return sections

    def _split_by_paragraphs(self, text: str) -> list[str]:
        """Blank-line split with greedy merge and overlap carry-over
        (chunker.rs:180-232).

        Fast path: in word-approximation mode the token count of
        ``current + "\\n\\n" + para`` is exactly ``ceil((wc_cur+wc_para)*1.3)``
        (whitespace joins preserve word counts), so the merged-candidate
        count is arithmetic instead of a re-join + re-split -- same result,
        O(n) instead of O(n^2)."""
        approx = self._tokenizer is None and self._bpe is None
        chunks: list[str] = []
        current = ""
        cur_wc = 0  # word count of `current`, maintained in approx mode

        for para in text.split("\n\n"):
            para = para.strip()
            if not para:
                continue
            para_wc = len(para.split()) if approx else 0

            para_tokens = (
                math.ceil(para_wc * 1.3) if approx else self.count_tokens(para)
            )
            if para_tokens > self.config.max_tokens:
                # flush accumulator, token-split the oversized paragraph;
                # its sub-chunks are complete -- nothing carries into current
                if current.strip():
                    chunks.append(current)
                    current = ""
                    cur_wc = 0
                chunks.extend(self._split_by_tokens(para))
                continue

            candidate = para if not current else f"{current}\n\n{para}"
            cand_tokens = (
                math.ceil((cur_wc + para_wc) * 1.3)
                if approx
                else self.count_tokens(candidate)
            )
            if cand_tokens <= self.config.max_tokens:
                current = candidate
                cur_wc += para_wc
            else:
                if current.strip():
                    chunks.append(current)
                overlap = self._tail_overlap(current)
                current = para if not overlap else f"{overlap}\n\n{para}"
                cur_wc = (len(overlap.split()) if overlap else 0) + para_wc

        if current.strip():
            chunks.append(current)
        return chunks

    def _split_by_tokens(self, text: str) -> list[str]:
        """Raw token-window split with overlap rewind and guaranteed advance
        (chunker.rs:236-279)."""
        words = text.split()
        if not words:
            return []
        if self._tokenizer is None and self._bpe is None:
            return self._split_by_tokens_fast(words)

        chunks: list[str] = []
        start = 0
        n = len(words)
        while start < n:
            end = start + 1
            while end < n:
                candidate = " ".join(words[start : end + 1])
                if self.count_tokens(candidate) > self.config.max_tokens:
                    break
                end += 1
            chunks.append(" ".join(words[start:end]))

            if self.config.overlap_tokens == 0 or end >= n:
                start = end
            else:
                overlap_words = 0
                tok_count = 0
                for w in reversed(words[:end]):
                    w_tokens = self.count_tokens(w)
                    if tok_count + w_tokens > self.config.overlap_tokens:
                        break
                    tok_count += w_tokens
                    overlap_words += 1
                new_start = max(end - overlap_words, 0)
                # always advance past a stall (oversized-word guard)
                start = new_start if new_start > start else end
        return chunks

    def _split_by_tokens_fast(self, words: list[str]) -> list[str]:
        """Word-approximation twin of _split_by_tokens: every candidate
        count is ``ceil(n_words*1.3)`` and every single word counts
        ``ceil(1.3) == 2`` tokens, so the grow/rewind loops are pure
        arithmetic. Produces byte-identical output to the slow loop."""
        max_tokens = self.config.max_tokens
        overlap_tokens = self.config.overlap_tokens
        n = len(words)
        chunks: list[str] = []
        start = 0
        while start < n:
            end = start + 1
            while end < n and math.ceil((end - start + 1) * 1.3) <= max_tokens:
                end += 1
            chunks.append(" ".join(words[start:end]))

            if overlap_tokens == 0 or end >= n:
                start = end
            else:
                # each word costs 2 tokens; rewind while it still fits
                overlap_words = min(overlap_tokens // 2, end)
                new_start = max(end - overlap_words, 0)
                start = new_start if new_start > start else end
        return chunks

    def _tail_overlap(self, text: str) -> str:
        """Suffix of ``text`` whose token count is <= overlap_tokens
        (chunker.rs:282-299)."""
        if self.config.overlap_tokens == 0 or not text:
            return ""
        taken = 0
        result: list[str] = []
        for w in reversed(text.split()):
            new_count = taken + self.count_tokens(w)
            if new_count > self.config.overlap_tokens:
                break
            taken = new_count
            result.append(w)
        result.reverse()
        return " ".join(result)


def chunk_column(df, column: str, config: ChunkerConfig | None = None, out: str = "chunk"):
    """Chunk a string column distributively: pandas UDF -> explode.

    Returns ``df`` with two added columns: ``{out}_idx`` (0-based position of
    the chunk within its document) and ``{out}`` (the chunk text). Rows whose
    text produces no chunks (empty/blank, reference chunker.rs:77-79) are
    dropped, matching the reference behavior of inserting nothing.

    Scale notes: the chunker runs where the data lives (mapPartitions-style
    via Arrow batches); the only shuffle is whatever the caller does next.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    cfg = config or ChunkerConfig()

    @pandas_udf(T.ArrayType(T.StringType()))
    def _chunk(s: pd.Series) -> pd.Series:
        chunker = MarkdownChunker(cfg)
        return s.map(lambda t: chunker.chunk(t if t is not None else ""))

    exploded = df.withColumn(
        "__chunks", _chunk(F.col(column).cast("string"))
    ).select(
        "*",
        F.posexplode("__chunks").alias(f"{out}_idx", out),
    )
    return exploded.drop("__chunks")
