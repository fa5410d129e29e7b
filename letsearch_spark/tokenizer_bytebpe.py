"""Byte-level BPE tokenizer -- the GPT-2 family's public standard
(Radford et al. 2019; merges per Sennrich et al. 2016 over a byte
alphabet), completing the in-repo trainer family next to word-level BPE
(tokenizer.py) and the SentencePiece-style unigram LM
(tokenizer_unigram.py).

Why a third tokenizer: word-level BPE cannot represent a word whose
characters were never seen (OOV alphabet), and the unigram model shares
the problem. Byte-level BPE's alphabet is ALL 256 byte values, so every
string -- any language, emoji, binary-ish noise -- encodes losslessly
and ``decode(encode(x)) == x`` exactly, which is why the public LLM
stacks train this variant.

Spark-first shape, same as tokenizer.py's word-level architecture:

* **pretoken counting is distributed** -- one Arrow-batched pass maps
  text to byte-unicode pretokens (regex pretokenization + the
  byte->printable-char bijection), one explode + groupBy produces the
  ``(pretoken, count)`` table; only its top ``max_word_types`` rows
  (deterministic ``count desc, token asc``) travel to the driver;
* **merge training is driver-side** over that bounded table -- the
  SAME incremental merge kernel as word-level BPE
  (tokenizer._train_merges_from_symbols), just without the ``</w>``
  sentinel (byte-level BPE carries the leading-space convention in the
  pretokens instead);
* **application is distributed at distinct-pretoken cost** --
  :func:`token_count_exact_bytebpe` deduplicates pretokens across
  documents, encodes each type ONCE, and broadcast-joins the per-type
  token lengths back (the token_count_exact architecture).

Pretokenization: a GPT-2-style pattern (contractions, optionally
space-prefixed letter runs / digit runs / punctuation runs, trailing
whitespace) expressed with pure-Python ``re`` character classes
(``[^\\W\\d_]`` for unicode letters). It runs ONLY in Python -- both in
the Arrow pass and the sequential twin, the same function object -- so
the distributed/twin bit-identity can never hinge on Java-vs-Python
regex unicode semantics. The match alternatives cover every character,
so ``''.join(pretokenize(t)) == t`` (lossless, pinned by tests).

No reference analog (SURVEY.md §2.7 north-star family; the reference
only LOADS prebuilt HF tokenizer files, hf_ops.rs). The byte<->unicode
bijection is the public GPT-2 construction: the 188 printable/non-space
latin-1 bytes map to themselves, the other 68 shift to 256+i so every
symbol is a visible character.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from letsearch_spark.tokenizer import _train_merges_from_symbols

# GPT-2-style pretokenization in portable pure-Python re (documented
# simplification of the original \p{L}/\p{N} pattern): contractions,
# " ?"-prefixed unicode-letter runs ([^\W\d_] == \w minus digits and
# underscore), digit runs, punctuation runs (non-word non-space, plus
# the underscore \w steals), whitespace-before-nonspace, whitespace.
#
# Branch order (r11, guide §4.2 micro): the letter/digit runs lead
# because they dominate natural text and Python's re tries alternation
# branches in order at every position. The reorder is provably
# output-identical to the documented GPT-2 order (contraction branch
# first): the contraction branch matches only at a literal "'", where
# the letter and digit branches can never match (" ?" cannot consume a
# quote and both runs need a letter/digit next), so the only ordering
# that carries semantics -- contraction BEFORE the punctuation run,
# else "'t" in "don't" splits as "'"+"t" -- is preserved. Pinned by
# test_pretoken_branch_reorder_matches_documented_order; measured ~8%
# off the regex pass (min-of-7, sf0.1 corpus: 0.0634 -> 0.0580 s).
_PRETOKEN_RE = re.compile(
    r" ?[^\W\d_]+"
    r"| ?\d+"
    r"|'(?:s|t|re|ve|m|ll|d)"
    r"| ?(?:[^\w\s]|_)+"
    r"|\s+(?!\S)"
    r"|\s+",
    re.UNICODE,
)


def pretokenize(text: str) -> list[str]:
    """GPT-2-style pretokens; lossless: ``''.join(out) == text``."""
    return _PRETOKEN_RE.findall(text)


def _bytes_to_unicode() -> dict[int, str]:
    """The public GPT-2 byte<->printable-unicode bijection: bytes in
    the printable latin-1 ranges (``!``-``~``, ``¡``-``¬``,
    ``®``-``ÿ``) map to their own code points; the remaining 68 bytes
    (controls, space, DEL, ...) map to 256+k in first-gap order, so
    every byte symbol is a visible, non-space character and merge
    tables stay human-readable."""
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    mapping: dict[int, str] = {b: chr(b) for b in keep}
    shift = 0
    for b in range(256):
        if b not in mapping:
            mapping[b] = chr(256 + shift)
            shift += 1
    return mapping


_BYTE_TO_UNI = _bytes_to_unicode()
_UNI_TO_BYTE = {c: b for b, c in _BYTE_TO_UNI.items()}
# the 256-symbol alphabet in byte order -- every model shares it
_ALPHABET = [_BYTE_TO_UNI[b] for b in range(256)]


# byte -> symbol as a C-speed str.translate table (r10, guide §4.2):
# encode('utf-8').decode('latin-1') maps byte b to chr(b) one-to-one,
# then translate maps chr(b) -> _BYTE_TO_UNI[b] -- identical output to
# the per-byte Python join at ~1.5x the speed (the residual cost is
# the pretoken regex itself)
_BYTE_TRANSLATE = str.maketrans({b: c for b, c in _BYTE_TO_UNI.items()})


def to_byte_symbols(pretoken: str) -> str:
    """UTF-8 bytes of a pretoken as the byte-unicode symbol string --
    the space every merge operates in."""
    return pretoken.encode("utf-8").decode("latin-1").translate(
        _BYTE_TRANSLATE
    )


def _make_pretokens_fn():
    """Factory for the text -> byte-symbol-pretokens function -- the
    ONE copy shared by the model, the trainers, and both Arrow UDFs
    (r9 review catch: a drift between two copies would silently break
    the trained-model/distributed-count bit-identity the oracle pins).
    Returned as a closure over plain data so cloudpickle ships it by
    VALUE -- no letsearch_spark import needed on executor workers.

    The pretoken -> symbol-string conversion is memoized per closure
    instance (r11, guide §4.2 -- the langid gram-memo precedent):
    natural-language pretoken types repeat massively, and the
    per-occurrence encode/decode/translate of ~5-char strings was 65%
    of the pass (measured 0.229 -> 0.096 s on the sf0.1 corpus,
    outputs identical -- the conversion is a pure function of the
    pretoken). The memo resets past ``_MEMO_CAP`` distinct types so an
    adversarial corpus cannot grow it without bound."""
    find = _PRETOKEN_RE.findall
    table = str.maketrans({b: c for b, c in _BYTE_TO_UNI.items()})
    memo: dict[str, str] = {}
    _MEMO_CAP = 1 << 20

    def run(text) -> list[str]:
        if text is None:
            return []
        if len(memo) > _MEMO_CAP:
            memo.clear()
        get = memo.get
        out = []
        append = out.append
        for p in find(text):
            s = get(p)
            if s is None:
                s = memo[p] = (
                    p.encode("utf-8").decode("latin-1").translate(table)
                )
            append(s)
        return out

    return run


def _make_greedy_merge(ranks: dict[tuple[str, str], int]):
    """Factory for the greedy lowest-rank merge loop (the standard BPE
    apply rule) over a symbol list -- the ONE copy shared by
    ByteBpeModel.encode_pretoken and the distributed count UDF.
    Mutates and returns its argument. Closure-by-value, like
    :func:`_make_pretokens_fn`."""

    def merge(syms: list[str]) -> list[str]:
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
        return syms

    return merge


@dataclass
class ByteBpeModel:
    """Trained byte-level merge list. The alphabet is implicitly all
    256 byte symbols; ``merges`` is rank-ordered (greedy
    lowest-rank-first application reproduces training)."""

    merges: list[tuple[str, str]]
    pretoken_types: int  # pretoken types the trainer saw (after the cap)
    coverage: float  # fraction of corpus pretoken occurrences covered
    _ranks: dict[tuple[str, str], int] = field(
        default_factory=dict, repr=False, compare=False
    )
    _cache: dict[str, list[str]] = field(
        default_factory=dict, repr=False, compare=False
    )
    _merge: object = field(default=None, repr=False, compare=False)

    def __post_init__(self) -> None:
        self._ranks = {pair: i for i, pair in enumerate(self.merges)}
        self._merge = _make_greedy_merge(self._ranks)

    @property
    def vocab(self) -> list[str]:
        """256 byte symbols, then one new symbol per merge
        (deduplicated, deterministic order)."""
        out = list(_ALPHABET)
        seen = set(out)
        for a, b in self.merges:
            s = a + b
            if s not in seen:
                seen.add(s)
                out.append(s)
        return out

    def encode_pretoken(self, pretoken: str) -> list[str]:
        """Greedy lowest-rank merging over the pretoken's byte
        symbols."""
        if pretoken == "":
            return []
        hit = self._cache.get(pretoken)
        if hit is not None:
            return hit
        syms = self._merge([_BYTE_TO_UNI[b] for b in pretoken.encode("utf-8")])
        if len(self._cache) < 1_000_000:  # bound driver/executor memory
            self._cache[pretoken] = syms
        return syms

    def encode(self, text: str) -> list[str]:
        out: list[str] = []
        for p in pretokenize(text):
            out.extend(self.encode_pretoken(p))
        return out

    def decode(self, tokens: list[str]) -> str:
        """EXACT inverse of :meth:`encode` for any input -- the whole
        point of the byte alphabet (word-level BPE's ``</w>`` in-band
        sentinel ambiguity does not exist here)."""
        bs = bytes(_UNI_TO_BYTE[c] for t in tokens for c in t)
        return bs.decode("utf-8")

    def token_count(self, text: str) -> int:
        return sum(len(self.encode_pretoken(p)) for p in pretokenize(text))

    def save(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            json.dump(
                {
                    "kind": "byte_bpe",
                    "merges": [list(p) for p in self.merges],
                    "pretoken_types": self.pretoken_types,
                    "coverage": self.coverage,
                },
                f,
                ensure_ascii=False,
            )

    @classmethod
    def load(cls, path: str) -> "ByteBpeModel":
        with open(path, encoding="utf-8") as f:
            d = json.load(f)
        return cls(
            merges=[tuple(p) for p in d["merges"]],
            pretoken_types=int(d["pretoken_types"]),
            coverage=float(d["coverage"]),
        )

    @classmethod
    def load_cached(cls, path: str) -> "ByteBpeModel":
        """Per-process cache (the tokenizer.py load_cached contract:
        Arrow-batched UDFs build helpers once per batch)."""
        hit = _LOAD_CACHE.get(path)
        if hit is None:
            hit = cls.load(path)
            _LOAD_CACHE[path] = hit
        return hit


_LOAD_CACHE: dict[str, ByteBpeModel] = {}


def pretoken_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Distributed ``(token, count)`` table of byte-unicode pretokens --
    the only shuffle in training, carrying pretoken TYPES, never text.
    The pretokenizer + byte mapping run in one Arrow-batched pandas UDF
    (the same Python function the twin uses -- cross-engine regex
    parity is a non-goal by construction)."""
    run = _make_pretokens_fn()

    @F.pandas_udf("array<string>")
    def _pre(s: pd.Series) -> pd.Series:
        return s.map(run)

    return (
        df.select(F.explode(_pre(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def train_byte_bpe(
    df: DataFrame,
    text_col: str,
    vocab_size: int,
    max_word_types: int = 1_000_000,
    min_count: int = 1,
) -> ByteBpeModel:
    """Train byte-level BPE on a text column: ONE distributed pretoken
    count (persisted across its top-k collect + total), driver-side
    merges. ``vocab_size`` bounds 256 + merges; ``max_word_types`` caps
    the table pulled to the driver (count-desc, token-asc deterministic
    order -- byte-unicode symbols are all BMP chars below U+0400, so
    Java UTF-16 and Python code-point orders agree) and the returned
    ``coverage`` records the occurrence mass kept, so a silent cap is a
    number, not a mystery. Bit-identical to
    :func:`train_byte_bpe_twin` over the same corpus at any
    partitioning (exact integer counts + deterministic order + the
    shared merge kernel)."""
    wc_all = pretoken_counts(df, text_col).persist()
    try:
        top = (
            wc_all.where(F.col("count") >= min_count)
            .orderBy(F.desc("count"), F.asc("token"))
            .limit(max_word_types)
            .collect()
        )
        if not top:
            raise ValueError(f"no text found in column {text_col!r}")
        totals = wc_all.agg(F.sum("count").alias("t")).first()
    finally:
        wc_all.unpersist()
    total = int(totals["t"] or 0)
    kept = sum(int(r["count"]) for r in top)
    return _fit_from_counts(
        [(r["token"], int(r["count"])) for r in top],
        vocab_size,
        kept / total if total else 0.0,
    )


def train_byte_bpe_twin(
    texts: list[str],
    vocab_size: int,
    max_word_types: int = 1_000_000,
    min_count: int = 1,
) -> ByteBpeModel:
    """Sequential twin of :func:`train_byte_bpe`: same pretokenizer,
    same byte mapping, same (count desc, token asc) cap, same merge
    kernel -- the computed-oracle reference implementation."""
    from collections import Counter

    wc = Counter(
        to_byte_symbols(p) for t in texts for p in pretokenize(t or "")
    )
    if not wc:
        raise ValueError("no text to train on")
    ordered = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
    top = [(t, c) for t, c in ordered if c >= min_count][:max_word_types]
    total = sum(wc.values())
    kept = sum(c for _, c in top)
    return _fit_from_counts(top, vocab_size, kept / total if total else 0.0)


def _fit_from_counts(
    wc: list[tuple[str, int]], vocab_size: int, coverage: float
) -> ByteBpeModel:
    """Shared driver half: symbolize, budget merges against the fixed
    256-symbol alphabet, run the shared merge kernel."""
    if vocab_size <= 256:
        raise ValueError(
            f"vocab_size must exceed the 256-byte alphabet, got {vocab_size}"
        )
    words = [list(t) for t, _ in wc if t]
    counts = [c for t, c in wc if t]
    merges = _train_merges_from_symbols(words, counts, vocab_size - 256)
    return ByteBpeModel(
        merges=merges, pretoken_types=len(wc), coverage=coverage
    )


def token_count_exact_bytebpe(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: ByteBpeModel,
    out_col: str = "n_tokens",
) -> DataFrame:
    """(id, n_tokens) with byte-BPE-exact counts at distinct-pretoken
    cost -- the token_count_exact architecture: (id, pretoken) explode
    + per-doc counts, pretoken types deduplicated ACROSS documents,
    each type encoded ONCE in an Arrow-batched UDF, per-type lengths
    broadcast-joined back. Documents with no pretokens (null/empty)
    keep a 0 row."""
    run = _make_pretokens_fn()
    merge = _make_greedy_merge({pair: i for i, pair in enumerate(model.merges)})

    @F.pandas_udf("array<string>")
    def _pre(s: pd.Series) -> pd.Series:
        return s.map(run)

    @F.pandas_udf("long")
    def _tok_len(w: pd.Series) -> pd.Series:
        # input is already in byte-symbol space; greedy merge only
        return w.map(lambda sym_str: len(merge(list(sym_str))))

    pairs = (
        df.select(F.col(id_col), F.explode(_pre(F.col(text_col))).alias("__t"))
        .groupBy(id_col, "__t")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    types = pairs.select("__t").distinct().withColumn("__len", _tok_len("__t"))
    per_doc = (
        pairs.join(F.broadcast(types), "__t")
        .groupBy(id_col)
        .agg(F.sum(F.col("__n") * F.col("__len")).alias(out_col))
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col(out_col), F.lit(0)).cast("long").alias(out_col),
        )
    )


def encode_ids_column(
    df: DataFrame,
    text_col: str,
    model: ByteBpeModel,
    out_col: str = "token_ids",
) -> DataFrame:
    """Add an ``array<int>`` column of byte-BPE token IDS (positions in
    ``model.vocab``: the 256 byte symbols in byte order, then one id
    per merge) -- the trainer-facing egress form, sibling of
    tokenizer.py encode_ids_column. No ``unk_id``: every symbol a merge
    can produce is in the vocab by construction (the byte alphabet is
    total), so unknown ids are structurally impossible. Arrow-batched,
    pretoken-memoized."""
    run = _make_pretokens_fn()
    merge = _make_greedy_merge({p: i for i, p in enumerate(model.merges)})
    id_of = {tok: i for i, tok in enumerate(model.vocab)}

    @F.pandas_udf("array<int>")
    def _ids(s: pd.Series) -> pd.Series:
        memo: dict[str, list[int]] = {}

        def enc(text) -> list[int]:
            if not isinstance(text, str):
                return []
            out: list[int] = []
            for sym_str in run(text):
                hit = memo.get(sym_str)
                if hit is None:
                    hit = [id_of[t] for t in merge(list(sym_str))]
                    memo[sym_str] = hit
                out.extend(hit)
            return out

        return s.map(enc)

    return df.withColumn(out_col, _ids(F.col(text_col)))
