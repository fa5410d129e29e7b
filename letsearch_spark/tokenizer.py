"""Distributed BPE tokenizer: exact token counts for the training-data
pipeline (chunk boundaries, sequence packing, token budgeting).

The reference approximates token counts as ``ceil(words * 1.3)`` unless
a pre-built HF tokenizer file is supplied (chunker.rs:106-114); nothing
in it can TRAIN a tokenizer. A 100 TB pipeline needs both, and the
Spark-first division of labor mirrors how production BPE is actually
built (Sennrich et al. 2016 train on a word-frequency table, not the
raw token stream):

* **word counting is distributed** -- one explode + one groupBy
  shuffle producing ``(word, count)``; text leaves the scan only as
  this table, and only its top ``max_word_types`` rows (deterministic
  ``count desc, word asc`` order) travel to the driver;
* **merge training is driver-side** over that bounded table --
  incremental pair-count updates, cost O(word_types · merge_depth),
  independent of corpus size;
* **application is distributed** again, with the scale property that
  encode cost is proportional to DISTINCT word types, not corpus
  tokens: :func:`token_count_exact` deduplicates words first, encodes
  each type ONCE (Arrow-batched UDF over the small distinct-word
  table), and broadcast-joins the per-type token lengths back.
  :func:`tokenize_column` (which must keep per-document token arrays)
  memoizes the word -> tokens map per Arrow batch instead.

Pre-tokenization is whitespace splitting with case preserved, plus the
classic ``</w>`` end-of-word sentinel as the final symbol of every
word, so ``decode(encode(w)) == w`` exactly and cross-word merges are
impossible.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"

# Pre-tokenization boundary, pinned to JAVA \s semantics (ASCII
# whitespace only: space \t \n \x0b \f \r) on BOTH engines. Python's
# str.split() splits on UNICODE whitespace (NBSP, ideographic space,
# ...), which would make driver-side token_count disagree with the
# distributed token_count_exact on scraped text -- so every Python-side
# split in this module goes through split_text, never str.split().
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def split_text(text: str) -> list[str]:
    """Driver/UDF-side twin of :func:`split_words` (Java-\\s parity)."""
    return [w for w in _WS.split(text) if w]


def split_words(col: Column) -> Column:
    """Whitespace pre-tokenization, case preserved (unlike
    functions.text.words, which lowercases for quality stats). Java \\s
    is ASCII-only; :func:`split_text` mirrors that exactly."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda w: w != F.lit(""))


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Distributed ``(word, count)`` frequency table -- the only shuffle
    in training, carrying word types instead of text."""
    return (
        df.select(F.explode(split_words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


@dataclass
class BpeModel:
    """Trained merge list + bookkeeping. ``merges`` is rank-ordered:
    applying them greedily lowest-rank-first reproduces training."""

    merges: list[tuple[str, str]]
    alphabet: list[str]
    word_types: int  # word types the trainer saw (after the cap)
    coverage: float  # fraction of corpus TOKEN occurrences covered
    _ranks: dict[tuple[str, str], int] = field(
        default_factory=dict, repr=False, compare=False
    )
    _cache: dict[str, list[str]] = field(
        default_factory=dict, repr=False, compare=False
    )

    def __post_init__(self) -> None:
        self._ranks = {pair: i for i, pair in enumerate(self.merges)}

    @property
    def vocab(self) -> list[str]:
        """Alphabet plus one new symbol per merge, deduplicated,
        deterministic order (alphabet first, then merge order)."""
        out: list[str] = []
        seen: set[str] = set()
        for sym in list(self.alphabet) + [a + b for a, b in self.merges]:
            if sym not in seen:
                seen.add(sym)
                out.append(sym)
        return out

    def encode_word(self, word: str) -> list[str]:
        """Greedy lowest-rank merging (the standard BPE apply loop)."""
        if word == "":
            return []
        hit = self._cache.get(word)
        if hit is not None:
            return hit
        syms = list(word[:-1]) + [word[-1] + END_OF_WORD]
        while len(syms) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(syms) - 1):
                r = self._ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        if len(self._cache) < 1_000_000:  # bound driver/executor memory
            self._cache[word] = syms
        return syms

    def encode(self, text: str) -> list[str]:
        out: list[str] = []
        for w in split_text(text):
            out.extend(self.encode_word(w))
        return out

    def decode(self, tokens: list[str]) -> str:
        """Inverse of :meth:`encode` -- debug/inspection helper.

        Caveat (inherent to sentinel-suffix BPE): a word whose TEXT
        contains the literal ``</w>`` substring decodes with a spurious
        space, because the in-band marker is indistinguishable from
        data. Counting and encoding are unaffected; pipelines never
        decode. Byte-level BPE would remove the ambiguity at the cost
        of unicode-opaque merges -- documented trade, not taken."""
        return "".join(tokens).replace(END_OF_WORD, " ").rstrip()

    def token_count(self, text: str) -> int:
        return sum(len(self.encode_word(w)) for w in split_text(text))

    def save(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            json.dump(
                {
                    "merges": [list(p) for p in self.merges],
                    "alphabet": self.alphabet,
                    "word_types": self.word_types,
                    "coverage": self.coverage,
                },
                f,
                ensure_ascii=False,
            )

    @classmethod
    def load(cls, path: str) -> "BpeModel":
        with open(path, encoding="utf-8") as f:
            d = json.load(f)
        return cls(
            merges=[tuple(p) for p in d["merges"]],
            alphabet=list(d["alphabet"]),
            word_types=int(d["word_types"]),
            coverage=float(d["coverage"]),
        )

    @classmethod
    def load_cached(cls, path: str) -> "BpeModel":
        """Per-process model cache: Arrow-batched UDFs construct their
        helper objects once per BATCH, so a bare load() would re-parse
        the merge list and restart the encode-word cache every few
        thousand rows. Keyed by path only -- replace the file under a
        new name if the model changes mid-process."""
        hit = _LOAD_CACHE.get(path)
        if hit is None:
            hit = cls.load(path)
            _LOAD_CACHE[path] = hit
        return hit


_LOAD_CACHE: dict[str, "BpeModel"] = {}


def _train_merges(
    wc: list[tuple[str, int]], num_merges: int
) -> tuple[list[tuple[str, str]], list[str]]:
    """Driver-side merge training over a (word, count) table: the
    word-level wrapper (``</w>`` sentinel symbols) around
    :func:`_train_merges_from_symbols`."""
    words = [list(w[:-1]) + [w[-1] + END_OF_WORD] for w, _ in wc if w]
    counts = [c for w, c in wc if w]
    alphabet = sorted({s for w in words for s in w})
    return _train_merges_from_symbols(words, counts, num_merges), alphabet


def _train_merges_from_symbols(
    words: list[list[str]], counts: list[int], num_merges: int
) -> list[tuple[str, str]]:
    """Greedy BPE merge training over pre-symbolized words with
    incremental pair-count maintenance: a pair -> {word_idx} index means
    each merge touches only the words that contain the merged pair, so
    total cost is O(sum_len + merges · affected), not
    O(word_types · merges). Symbol choice is the caller's (word-level
    ``</w>`` sentinel here; byte-unicode chars in
    tokenizer_bytebpe.py) -- the merge rule is shared verbatim.
    MUTATES ``words`` in place."""
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for idx, (syms, cnt) in enumerate(zip(words, counts)):
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + cnt
            pair_words.setdefault((a, b), set()).add(idx)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        # deterministic: max count, ties broken lexicographically smallest
        best = None
        best_cnt = 0
        for pair, cnt in pair_counts.items():
            if cnt > best_cnt or (cnt == best_cnt and best is not None and pair < best):
                best, best_cnt = pair, cnt
        if best is None or best_cnt <= 1:
            break  # nothing repeats: further merges would memorize words
        merges.append(best)
        new_sym = best[0] + best[1]
        for idx in list(pair_words.get(best, ())):
            syms, cnt = words[idx], counts[idx]
            # decrement ALL old pairs of this word, rebuild, increment new
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= cnt
                if pair_counts[(a, b)] <= 0:
                    s = pair_words.get((a, b))
                    if s is not None:
                        s.discard(idx)
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[idx] = out
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + cnt
                pair_words.setdefault((a, b), set()).add(idx)
        pair_counts[best] = 0
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str,
    vocab_size: int,
    max_word_types: int = 1_000_000,
    min_count: int = 1,
) -> BpeModel:
    """Train a BPE model on a text column.

    ``vocab_size`` bounds alphabet + merges; training stops earlier if
    no pair repeats. ``max_word_types`` caps the frequency table pulled
    to the driver (count-desc, word-asc deterministic order) -- the
    returned ``coverage`` records the fraction of corpus word
    OCCURRENCES the kept types represent, so a silent cap shows up as a
    number, not a mystery."""
    if vocab_size <= 0:
        raise ValueError(f"vocab_size must be positive, got {vocab_size}")
    # ONE corpus scan: the frequency table is persisted across its two
    # actions (top-k collect + unfiltered total), then released
    wc_all = word_counts(df, text_col).persist()
    try:
        top = (
            wc_all.where(F.col("count") >= min_count)
            .orderBy(F.desc("count"), F.asc("word"))
            .limit(max_word_types)
            .collect()
        )
        if not top:
            raise ValueError(f"no words found in column {text_col!r}")
        # denominator is the UNFILTERED occurrence mass, so both the
        # max_word_types cap AND the min_count cut show up in coverage
        totals = wc_all.agg(F.sum("count").alias("t")).first()
    finally:
        wc_all.unpersist()
    total = int(totals["t"] or 0)
    kept = sum(int(r["count"]) for r in top)
    coverage = kept / total if total else 0.0

    wc = [(r["word"], int(r["count"])) for r in top]
    # budget: merges = vocab_size - |alphabet| (alphabet is always in vocab)
    alphabet_size = len({s for w, _ in wc for s in (list(w[:-1]) + [w[-1] + END_OF_WORD])})
    num_merges = max(0, vocab_size - alphabet_size)
    merges, alphabet = _train_merges(wc, num_merges)
    return BpeModel(
        merges=merges,
        alphabet=alphabet,
        word_types=len(wc),
        coverage=coverage,
    )


def token_count_exact(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: BpeModel,
    out_col: str = "n_tokens",
) -> DataFrame:
    """(id, n_tokens) with BPE-exact counts, at distinct-word cost.

    Plan shape: posexplode-free -- (id, word) explode, groupBy (id,
    word) with counts, then the word table is deduplicated ACROSS
    documents, each distinct type is encoded once in an Arrow-batched
    UDF, and the per-type token length broadcast-joins back. The
    Python-side work is O(word_types), not O(corpus tokens): on a
    corpus where each type recurs ~1000x, the UDF does 0.1% of the
    naive per-row work. Documents with no words keep a 0 row."""
    ranks = {pair: i for i, pair in enumerate(model.merges)}

    @F.pandas_udf("long")
    def _tok_len(w: pd.Series) -> pd.Series:
        # self-contained (stdlib + captured plain data only): referencing
        # BpeModel here would make cloudpickle ship it by module
        # reference and require letsearch_spark importable on every
        # executor worker
        def enc_len(word: str) -> int:
            syms = list(word[:-1]) + [word[-1] + "</w>"]
            while len(syms) > 1:
                best_rank = None
                best_i = -1
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_rank is None:
                    break
                syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            return len(syms)

        return w.map(enc_len)

    pairs = df.select(
        F.col(id_col), F.explode(split_words(F.col(text_col))).alias("__w")
    ).groupBy(id_col, "__w").agg(F.count(F.lit(1)).alias("__n"))
    types = pairs.select("__w").distinct().withColumn("__len", _tok_len("__w"))
    per_doc = (
        pairs.join(F.broadcast(types), "__w")
        .groupBy(id_col)
        .agg(F.sum(F.col("__n") * F.col("__len")).alias(out_col))
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(id_col, F.coalesce(F.col(out_col), F.lit(0)).cast("long").alias(out_col))
    )


def encode_ids_column(
    df: DataFrame,
    text_col: str,
    model: BpeModel,
    out_col: str = "token_ids",
    unk_id: int = -1,
) -> DataFrame:
    """Add an ``array<int>`` column of BPE token IDS (positions in
    ``model.vocab``) -- the trainer-facing form of
    :func:`tokenize_column`. Symbols outside the vocabulary (characters
    the trainer never saw) map to ``unk_id``; the default -1 keeps them
    distinguishable so a caller can remap or assert none exist. Same
    Arrow-batched, word-memoized kernel as tokenize_column."""
    ranks = {pair: i for i, pair in enumerate(model.merges)}
    id_of = {tok: i for i, tok in enumerate(model.vocab)}

    @F.pandas_udf("array<int>")
    def _ids(s: pd.Series) -> pd.Series:
        # self-contained: stdlib + captured plain data only (see
        # token_count_exact); per-batch memo since word types repeat
        import re as _re

        ws = _re.compile(r"[ \t\n\x0b\f\r]+")  # Java-\s parity
        memo: dict[str, list[int]] = {}

        def enc_word(word: str) -> list[int]:
            hit = memo.get(word)
            if hit is not None:
                return hit
            syms = list(word[:-1]) + [word[-1] + "</w>"]
            while len(syms) > 1:
                best_rank = None
                best_i = -1
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_rank is None:
                    break
                syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            ids = [id_of.get(t, unk_id) for t in syms]
            memo[word] = ids
            return ids

        def enc(text) -> list[int]:
            if not isinstance(text, str):
                return []
            out: list[int] = []
            for w in ws.split(text):
                if w:
                    out.extend(enc_word(w))
            return out

        return s.map(enc)

    return df.withColumn(out_col, _ids(F.col(text_col)))


def tokenize_column(
    df: DataFrame,
    text_col: str,
    model: BpeModel,
    out_col: str = "tokens",
) -> DataFrame:
    """Add an ``array<string>`` column of BPE tokens. Arrow-batched UDF
    with per-executor word memoization (types repeat heavily inside a
    batch); use :func:`token_count_exact` when only counts are needed --
    it does strictly less work at scale."""
    ranks = {pair: i for i, pair in enumerate(model.merges)}

    @F.pandas_udf("array<string>")
    def _tok(s: pd.Series) -> pd.Series:
        # self-contained: stdlib + captured plain data only (see
        # token_count_exact); per-batch memo since word types repeat
        import re as _re

        ws = _re.compile(r"[ \t\n\x0b\f\r]+")  # Java-\s parity
        memo: dict[str, list[str]] = {}

        def enc_word(word: str) -> list[str]:
            hit = memo.get(word)
            if hit is not None:
                return hit
            syms = list(word[:-1]) + [word[-1] + "</w>"]
            while len(syms) > 1:
                best_rank = None
                best_i = -1
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_rank is None:
                    break
                syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            memo[word] = syms
            return syms

        def enc(text) -> list[str]:
            if not isinstance(text, str):
                return []
            out: list[str] = []
            for w in ws.split(text):
                if w:
                    out.extend(enc_word(w))
            return out

        return s.map(enc)

    return df.withColumn(out_col, _tok(F.col(text_col)))
