"""WordPiece tokenizer (the BERT family -- Schuster & Nakajima 2012;
trainer per the publicly documented likelihood-scored merge rule,
encoder per Devlin et al. 2018's greedy longest-match-first WordPiece).

Completes the trainer family next to tokenizer.py (frequency-scored
BPE), tokenizer_unigram.py (SentencePiece EM) and tokenizer_bytebpe.py
(GPT-2 byte level). vs BPE the TRAINER differs in one rule -- pair
score = count(pair) / (count(first) * count(second)), so merges prefer
pairs whose parts rarely occur apart -- and the ENCODER differs
entirely: no merge ranks at inference, just greedy longest-prefix
vocab matching with ``##`` continuation symbols and ``[UNK]`` for any
word the vocab cannot tile. Scores are compared by exact integer
cross-multiplication (c_p * c_qa * c_qb vs c_q * c_pa * c_pb), so
training is deterministic with a lexicographic pair tie-break and
bit-identical between the distributed path and the sequential twin.

Distributed shape identical to train_bpe: ONE word-count shuffle
(word TYPES cross the network, never text), driver-side training over
the capped frequency table, and token counting at distinct-type cost
(each distinct word encodes once in an Arrow-batched UDF, lengths
broadcast-join back). Word splitting is the repo-wide whitespace
convention (tokenizer.split_text) -- BERT's punctuation-splitting
basic tokenizer is a pre-processing choice outside the trainer, noted
as a documented divergence.

Words longer than ``word_max_chars`` (default 100, the BERT guard)
map straight to [UNK]: greedy matching is O(L^2) per word and a
megabyte-long "word" in crawl data must cost O(1), not O(10^12).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from letsearch_spark.tokenizer import split_text, word_counts

__all__ = [
    "WordPieceModel",
    "train_wordpiece",
    "train_wordpiece_twin",
    "token_count_exact_wordpiece",
]

UNK = "[UNK]"


def _symbolize(word: str) -> list[str]:
    return [word[0]] + ["##" + ch for ch in word[1:]]


def _merge_sym(a: str, b: str) -> str:
    return a + (b[2:] if b.startswith("##") else b)


def _make_greedy_encoder(vocab: set[str], max_chars: int):
    """ONE greedy longest-match-first implementation shared by the
    model API and the distributed counting UDF. The returned closure
    captures only plain data (set / int / str), so cloudpickle ships
    it by VALUE -- no letsearch_spark import needed on executor
    workers (the token_count_exact convention)."""
    unk = UNK

    def enc(word: str) -> list[str]:
        if not word:
            return []
        if len(word) > max_chars:
            return [unk]
        out: list[str] = []
        i = 0
        while i < len(word):
            end = len(word)
            piece = None
            while end > i:
                sub = word[i:end]
                if i > 0:
                    sub = "##" + sub
                if sub in vocab:
                    piece = sub
                    break
                end -= 1
            if piece is None:
                return [unk]
            out.append(piece)
            i = end
        return out

    return enc


def _encode_word_greedy(
    word: str, vocab: set[str], max_chars: int
) -> list[str]:
    return _make_greedy_encoder(vocab, max_chars)(word)


@dataclass
class WordPieceModel:
    """Frozen model: the vocab (alphabet symbols sorted, then merged
    tokens in merge order, plus [UNK]) is ALL the encoder needs --
    WordPiece inference never looks at merge ranks."""

    vocab: list[str]
    word_types: int
    coverage: float
    word_max_chars: int = 100
    _vset: set[str] = field(default_factory=set, repr=False)

    def __post_init__(self) -> None:
        self._vset = set(self.vocab)

    def encode_word(self, word: str) -> list[str]:
        return _encode_word_greedy(word, self._vset, self.word_max_chars)

    def encode(self, text: str) -> list[str]:
        return [
            t for w in split_text(text or "") for t in self.encode_word(w)
        ]

    def decode(self, tokens: list[str]) -> str:
        """Best-effort inverse ([UNK] is lossy by construction): ##
        pieces glue to the previous piece, others start a new word."""
        words: list[str] = []
        for t in tokens:
            if t.startswith("##") and words:
                words[-1] += t[2:]
            else:
                words.append(t)
        return " ".join(words)

    def token_count(self, text: str) -> int:
        return sum(len(self.encode_word(w)) for w in split_text(text or ""))

    def save(self, path: str) -> None:
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "type": "wordpiece",
                    "vocab": self.vocab,
                    "word_types": self.word_types,
                    "coverage": self.coverage,
                    "word_max_chars": self.word_max_chars,
                },
                f,
            )
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "WordPieceModel":
        with open(path) as f:
            d = json.load(f)
        if d.get("type") != "wordpiece":
            raise ValueError(f"{path} is not a wordpiece model")
        return cls(
            vocab=list(d["vocab"]),
            word_types=int(d["word_types"]),
            coverage=float(d["coverage"]),
            word_max_chars=int(d.get("word_max_chars", 100)),
        )


def _train_wordpiece_from_counts(
    wc: list[tuple[str, int]], vocab_size: int, coverage: float
) -> WordPieceModel:
    """Driver-side likelihood-scored merge training over a (word,
    count) table -- the shared core of the Spark path and the twin.
    Incremental pair/symbol-count maintenance (the
    _train_merges_from_symbols shape): each merge touches only words
    containing the merged pair. Stops when no pair repeats (count <= 1
    would memorize hapax words) or the vocab budget is spent."""
    words = [_symbolize(w) for w, _ in wc if w]
    counts = [c for w, c in wc if w]
    alphabet = sorted({s for w in words for s in w})
    merged: list[str] = []
    budget = max(0, vocab_size - len(alphabet) - 1)  # -1 for [UNK]

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    sym_counts: dict[str, int] = {}
    for idx, (syms, cnt) in enumerate(zip(words, counts)):
        for s in syms:
            sym_counts[s] = sym_counts.get(s, 0) + cnt
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + cnt
            pair_words.setdefault((a, b), set()).add(idx)

    for _ in range(budget):
        # argmax of c_p/(c_a*c_b) by exact integer cross-multiplication;
        # ties break to the lexicographically smallest pair
        best = None
        best_c = 0
        best_den = 1
        for pair, c in pair_counts.items():
            if c <= 1:
                continue
            den = sym_counts[pair[0]] * sym_counts[pair[1]]
            if best is None:
                best, best_c, best_den = pair, c, den
                continue
            lhs = c * best_den
            rhs = best_c * den
            if lhs > rhs or (lhs == rhs and pair < best):
                best, best_c, best_den = pair, c, den
        if best is None:
            break
        new_sym = _merge_sym(*best)
        merged.append(new_sym)
        for idx in list(pair_words.get(best, ())):
            syms, cnt = words[idx], counts[idx]
            for s in syms:
                sym_counts[s] -= cnt
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= cnt
                if pair_counts[(a, b)] <= 0:
                    pair_counts.pop((a, b), None)
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
            for s in out:
                sym_counts[s] = sym_counts.get(s, 0) + cnt
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + cnt
                pair_words.setdefault((a, b), set()).add(idx)
        pair_counts.pop(best, None)

    return WordPieceModel(
        vocab=alphabet + merged + [UNK],
        word_types=len(words),
        coverage=coverage,
    )


def train_wordpiece(
    df: DataFrame,
    text_col: str,
    vocab_size: int,
    max_word_types: int = 1_000_000,
    min_count: int = 1,
) -> WordPieceModel:
    """Train WordPiece on a text column: ONE distributed word count
    (persisted across its top-k collect + total), driver-side
    likelihood merges. Caps and coverage semantics identical to
    train_bpe (count-desc, word-asc deterministic order; coverage
    records the occurrence mass the kept types represent).
    Bit-identical to :func:`train_wordpiece_twin` at any
    partitioning."""
    if vocab_size <= 0:
        raise ValueError(f"vocab_size must be positive, got {vocab_size}")
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
        totals = wc_all.agg(F.sum("count").alias("t")).first()
    finally:
        wc_all.unpersist()
    total = int(totals["t"] or 0)
    kept = sum(int(r["count"]) for r in top)
    return _train_wordpiece_from_counts(
        [(r["word"], int(r["count"])) for r in top],
        vocab_size,
        kept / total if total else 0.0,
    )


def train_wordpiece_twin(
    texts: list[str],
    vocab_size: int,
    max_word_types: int = 1_000_000,
    min_count: int = 1,
) -> WordPieceModel:
    """Sequential twin of :func:`train_wordpiece`: same split, same
    (count desc, word asc) cap, same integer-scored merge kernel."""
    from collections import Counter

    wc = Counter(w for t in texts for w in split_text(t or ""))
    if not wc:
        raise ValueError("no words to train on")
    items = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
    kept = [(w, c) for w, c in items if c >= min_count][:max_word_types]
    total = sum(wc.values())
    mass = sum(c for _, c in kept)
    return _train_wordpiece_from_counts(
        kept, vocab_size, mass / total if total else 0.0
    )


def encode_ids_column_wordpiece(
    df: DataFrame,
    text_col: str,
    model: WordPieceModel,
    out_col: str = "token_ids",
) -> DataFrame:
    """Add an ``array<int>`` column of WordPiece token IDs (positions
    in ``model.vocab``). ``[UNK]`` is a REAL vocab entry, so
    untileable words map to its id -- no ``unk_id`` knob needed (the
    byte-BPE no-OOV convention, reached here by vocabulary design
    instead of alphabet totality). Same Arrow-batched, word-memoized
    kernel shape as tokenizer.encode_ids_column; the greedy closure
    and id map are plain data, pickled by value."""
    id_of = {tok: i for i, tok in enumerate(model.vocab)}
    enc = _make_greedy_encoder(set(model.vocab), model.word_max_chars)

    @F.pandas_udf("array<int>")
    def _ids(s: pd.Series) -> pd.Series:
        import re as _re

        ws = _re.compile(r"[ \t\n\x0b\f\r]+")  # Java-\s parity
        memo: dict[str, list[int]] = {}

        def enc_word(word: str) -> list[int]:
            hit = memo.get(word)
            if hit is None:
                hit = memo[word] = [id_of[t] for t in enc(word)]
            return hit

        def run(text) -> list[int]:
            if not isinstance(text, str):
                return []
            out: list[int] = []
            for w in ws.split(text):
                if w:
                    out.extend(enc_word(w))
            return out

        return s.map(run)

    return df.withColumn(out_col, _ids(F.col(text_col)))


def token_count_exact_wordpiece(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: WordPieceModel,
    out_col: str = "n_tokens",
) -> DataFrame:
    """(id, n_tokens) with WordPiece-exact counts at distinct-word cost
    -- the token_count_exact plan shape: (id, word) counts, the word
    table deduplicated ACROSS documents, each distinct type greedily
    encoded once in an Arrow-batched UDF, per-type lengths
    broadcast-joined back. Documents with no words keep a 0 row."""
    from letsearch_spark.tokenizer import split_words

    # the SAME greedy implementation the model API uses (r10 review
    # catch: a hand-copied counting loop could drift from encode_word);
    # the factory closure carries only plain data, so it pickles by
    # value
    enc = _make_greedy_encoder(set(model.vocab), model.word_max_chars)

    @F.pandas_udf("long")
    def _tok_len(w: pd.Series) -> pd.Series:
        return w.map(lambda word: len(enc(word)))

    pairs = (
        df.select(
            F.col(id_col), F.explode(split_words(F.col(text_col))).alias("__w")
        )
        .groupBy(id_col, "__w")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    types = pairs.select("__w").distinct().withColumn("__len", _tok_len("__w"))
    per_doc = (
        pairs.join(F.broadcast(types), "__w")
        .groupBy(id_col)
        .agg(F.sum(F.col("__n") * F.col("__len")).alias(out_col))
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col, F.coalesce(F.col(out_col), F.lit(0)).alias(out_col)
        )
    )
