"""Character-n-gram language identification (r10, VERDICT r9 next #4).

Multinomial Naive Bayes over hashed character n-grams -- the public
standard shape of langid.py (Lui & Baldwin 2012) with Cavnar-Trenkle
(1994) style space-bounded char n-grams. The reference engine has no
language detection (the 4-language stopword ``lang_id`` in
functions/text.py stays as the oracle-parity mode); this is the
web-scale pipeline operator: >= 20 languages, trainable from labeled
text, no wordlists at inference time.

DataFrame-native split of work (sibling of operators/classifier.py,
which is the binary-GD discriminative family; this is the generative
multiclass one):

1. **featurize** -- 1..n_max char n-grams over space-bounded
   normalized text, built from zip_with over shifted array slices
   (each lambda touches only its element args -- the O(len^2)
   transform(sequence) trap documented in SCALING.md never applies),
   hashed to ``num_buckets`` via the same md5-60bit idiom as
   dedup/DSIR. Pure Catalyst: the explode runs inside the scan.
2. **fit** -- ONE groupBy(lang, bucket) count; at most
   |langs| x num_buckets rows collect to the driver (bounded by
   construction, independent of corpus size). Laplace-smoothed
   log-likelihoods are frozen to integer MICRO-UNITS driver-side, so
   scoring is exact integer arithmetic -- deterministic under ANY
   partitioning and replayable bit-for-bit by the pure-Python twin.
3. **predict** -- one broadcast join (bucket -> per-lang weight
   deltas) + integer aggregations; no window (argmax is a
   max-of-struct with a unique per-lang index tie-break: equal scores
   resolve to the lexicographically smallest language). Unseen
   buckets contribute exactly the per-language floor via the delta
   trick: delta(b, l) = logp(b|l) - logp0(l) is stored only for
   OBSERVED (bucket, lang) pairs, and every doc adds
   total_grams * logp0(l), so a missing join row IS the smoothed
   floor -- no dense |langs| x num_buckets table anywhere.

Class priors are uniform by design: web-crawl training mixes are
wildly unbalanced and a corpus-frequency prior would just bake the
crawl's language mix into every downstream corpus.

Known exactness caveats vs the Python twin (documented, fixture-
avoided): Spark's split-by-empty-string cuts UTF-16 code units (an
astral-plane emoji splits into surrogate halves; Python cuts
codepoints), and Java vs Python differ on a handful of unicode
lower()/whitespace edge cases. Both only perturb which hash bucket a
rare gram lands in -- the classifier is statistical either way.
"""

from __future__ import annotations

import hashlib
import math
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from letsearch_spark.operators.dedup import md5_60

__all__ = [
    "LangIdModel",
    "char_ngram_features",
    "fit_langid",
    "fit_langid_twin",
    "predict_lang",
    "predict_lang_twin",
    "synthetic_multilingual_corpus",
    "MULTILINGUAL_VOCAB",
]

MICRO = 1_000_000


def _micro(x: float) -> int:
    """HALF_UP fixed-point micro-units (one rounding site, driver-only:
    Spark never rounds -- it consumes the frozen integers)."""
    return int(math.floor(x * MICRO + 0.5))


# ---------------------------------------------------------------- featurize


def _ngram_arrays(df: DataFrame, text_col: str, n_max: int) -> DataFrame:
    """Append ``__g`` -- the concatenated 1..n_max char-gram array over
    space-bounded normalized text. Each n-gram order is materialized as
    its own column between projections and built by zip_with over
    shifted slices of the PREVIOUS order, so no outer expression is
    re-evaluated per element."""
    if n_max < 1 or n_max > 6:
        raise ValueError(f"n_max must be in [1, 6], got {n_max}")
    norm = F.concat(
        F.lit(" "),
        F.regexp_replace(
            F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))),
            r"\s+",
            " ",
        ),
        F.lit(" "),
    )
    out = df.withColumn("__c1", F.split(norm, ""))
    length = F.size("__c1")
    for n in range(2, n_max + 1):
        take = F.greatest(length - (n - 1), F.lit(0))
        out = out.withColumn(
            f"__c{n}",
            F.zip_with(
                F.slice(f"__c{n - 1}", 1, take),
                F.slice("__c1", n, take),
                lambda a, b: F.concat(a, b),
            ),
        )
    grams = F.concat(*[F.col(f"__c{n}") for n in range(1, n_max + 1)])
    return out.withColumn("__g", grams).drop(
        *[f"__c{n}" for n in range(1, n_max + 1)]
    )


def char_ngram_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_max: int = 3,
    num_buckets: int = 4096,
    seed: int = 42,
) -> DataFrame:
    """(id, bucket, cnt): hashed char 1..n_max-gram counts per doc."""
    return (
        _ngram_arrays(
            df.select(F.col(id_col).alias("id"), text_col), text_col, n_max
        )
        .select("id", F.explode("__g").alias("__f"))
        .select(
            "id",
            (
                md5_60(F.concat(F.col("__f"), F.lit(f"#langid{seed}")))
                % num_buckets
            ).alias("bucket"),
        )
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------- fit


@dataclass
class LangIdModel:
    """Frozen NB model: sorted language list, per-language smoothed
    floor logp0 (micro-units), and sparse (bucket, lang_idx) -> delta
    micro-units for observed pairs. All integers: scoring is exact."""

    langs: list[str]
    logp0_micro: list[int]
    delta_micro: dict[tuple[int, int], int]
    n_max: int
    num_buckets: int
    seed: int
    alpha: float

    def weights_df(self, spark) -> DataFrame:
        rows = [
            (b, li, dm) for (b, li), dm in sorted(self.delta_micro.items())
        ]
        return spark.createDataFrame(
            rows, "bucket long, __li int, __dm long"
        )

    def base_df(self, spark) -> DataFrame:
        rows = [
            (li, lang, lp)
            for li, (lang, lp) in enumerate(
                zip(self.langs, self.logp0_micro)
            )
        ]
        return spark.createDataFrame(
            rows, "__li int, __lang string, __lp0 long"
        )


def _model_from_counts(
    counts: dict[str, dict[int, int]],
    n_max: int,
    num_buckets: int,
    seed: int,
    alpha: float,
) -> LangIdModel:
    """Shared driver-side model assembly (Spark fit and Python twin
    feed the same integer count maps through this one code path, so
    fit parity reduces to count parity)."""
    langs = sorted(counts)
    if not langs:
        raise ValueError("no labeled training rows")
    logp0_micro: list[int] = []
    delta_micro: dict[tuple[int, int], int] = {}
    for li, lang in enumerate(langs):
        by_bucket = counts[lang]
        tot = sum(by_bucket.values())
        denom = tot + alpha * num_buckets
        logp0 = math.log(alpha / denom)
        logp0_micro.append(_micro(logp0))
        for b, c in by_bucket.items():
            delta_micro[(b, li)] = _micro(
                math.log((c + alpha) / denom) - logp0
            )
    return LangIdModel(
        langs=langs,
        logp0_micro=logp0_micro,
        delta_micro=delta_micro,
        n_max=n_max,
        num_buckets=num_buckets,
        seed=seed,
        alpha=alpha,
    )


def _kernel_doc_buckets(
    text: str | None,
    n_max: int,
    num_buckets: int,
    seed: int,
    memo: dict[str | tuple[str, ...], int] | None = None,
) -> dict[int, int]:
    """Per-doc hashed-bucket counts, Arrow-kernel side: counts distinct
    GRAMS first so md5 runs once per (doc, gram type), not per
    occurrence -- identical result to hashing every occurrence because
    bucket(g) is a pure function of g. ``memo`` (task-lifetime
    gram -> bucket cache) cuts the md5 cost further: natural-language
    char grams repeat massively across documents, and the cache is a
    pure-function table, so sharing it across docs/tasks cannot change
    any result.

    r10 optimization (guide §4.2 -- hand whole batches to C-speed
    code): the per-occurrence Python work is gone. n=1 grams are
    counted by ``Counter(text)`` directly (a C loop over the string);
    n>=2 grams are counted as CHARACTER TUPLES via ``Counter.update(
    zip(...))`` (C-speed, no per-occurrence string join) and joined to
    a string only once per DISTINCT gram at memo-miss time. The memo
    therefore keys str (n=1) and tuple (n>=2) grams -- lengths differ
    per n so tuples never collide across n, and str never equals
    tuple. Output identical to the per-occurrence form by construction
    (counting tuples then joining distinct == joining then counting);
    measured 1.9x at sf0.1 with bit-equal outputs."""
    from collections import Counter

    t = re.sub(
        r"[ \t\n\x0b\f\r]+", " ", (text or "").strip(" \t\n\x0b\f\r").lower()
    )
    t = f" {t} "
    cnt: Counter = Counter(t)
    for n in range(2, n_max + 1):
        cnt.update(zip(*(t[i:] for i in range(n))))
    out: dict[int, int] = {}
    if memo is None:
        memo = {}
    get = memo.get
    for g, c in cnt.items():
        b = get(g)
        if b is None:
            b = memo[g] = _twin_bucket(
                g if isinstance(g, str) else "".join(g), seed, num_buckets
            )
        prev = out.get(b)
        out[b] = c if prev is None else prev + c
    return out


def fit_langid(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    n_max: int = 3,
    num_buckets: int = 4096,
    alpha: float = 1.0,
    seed: int = 42,
    method: str = "kernel",
) -> LangIdModel:
    """Train from (lang, text) rows; null labels are skipped. The
    collect is <= |langs| x num_buckets rows regardless of corpus size.

    method='kernel' (default -- the 100-TB shape): an Arrow-batched
    mapInPandas pass emits each PARTITION-BATCH's (lang, bucket, cnt)
    partial count map (map-side combine in Python), and one bounded
    groupBy reduces them -- the corpus-sized char-gram explode never
    exists as rows. method='catalyst' is the pure-Catalyst twin
    (zip_with n-grams + explode + count), pinned bit-identical in
    pytest; measured 2.1x slower at sf0.1 because the per-row array
    churn + 3L-row explode dominate (SCALING.md r10) -- it exists so
    the kernel has an in-engine cross-check, the knn_join
    expr-vs-numpy precedent."""
    labeled = df.where(F.col(lang_col).isNotNull()).select(
        F.col(lang_col).alias("__lang"), F.col(text_col).alias("__text")
    )
    if method == "catalyst":
        grams = char_ngram_features(
            labeled,
            "__lang",
            "__text",
            n_max=n_max,
            num_buckets=num_buckets,
            seed=seed,
        )
        rows = grams.collect()
    elif method == "kernel":
        import pandas as pd

        def run(batches):
            memo: dict[str | tuple[str, ...], int] = {}
            for pdf in batches:
                agg: dict[tuple[str, int], int] = {}
                for lang, text in zip(pdf["__lang"], pdf["__text"]):
                    for b, c in _kernel_doc_buckets(
                        text, n_max, num_buckets, seed, memo
                    ).items():
                        agg[(lang, b)] = agg.get((lang, b), 0) + c
                yield pd.DataFrame(
                    [(l, b, c) for (l, b), c in agg.items()],
                    columns=["id", "bucket", "cnt"],
                )

        rows = (
            labeled.mapInPandas(
                run, schema="id string, bucket long, cnt long"
            )
            .groupBy("id", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
            .collect()
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    counts: dict[str, dict[int, int]] = {}
    for r in rows:
        counts.setdefault(r["id"], {})[int(r["bucket"])] = int(r["cnt"])
    return _model_from_counts(counts, n_max, num_buckets, seed, alpha)


# ---------------------------------------------------------------- predict


def predict_lang(
    df: DataFrame,
    model: LangIdModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "pred_lang",
    method: str = "kernel",
) -> DataFrame:
    """(id_col, pred_lang, score_micro): NB argmax per doc.

    method='kernel' (default -- the 100-TB shape): MAP-ONLY. An
    Arrow-batched mapInPandas kernel scores each doc locally against a
    dense int64 (num_buckets x |langs|) delta matrix rebuilt once per
    executor from the frozen model (<1 MB at 26 langs x 4096 buckets)
    -- zero shuffles, zero joins, cost tracks the scan. np.argmax's
    first-max rule IS the smallest-index tie-break. Measured 7x faster
    than the Catalyst path at sf0.1 (SCALING.md r10): the 3L-per-doc
    char-gram explode never materializes as rows.

    method='catalyst' -- the pure-Catalyst twin (kept as the in-engine
    cross-check, knn_join's expr-vs-numpy precedent): featurize
    (explode + groupBy id,bucket), ONE broadcast join onto the sparse
    weight table, integer sums, and a max-of-struct argmax -- no
    window, no floats. Both methods produce identical integers
    (pytest-pinned; the only divergence surface is the documented
    Java-vs-Python unicode edge set).

    score_micro magnitude is bounded by total_grams x |logp0| ~
    3-len(text) x ~2e7, far inside int64 even for gigabyte documents."""
    if method == "kernel":
        return _predict_lang_kernel(df, model, id_col, text_col, out_col)
    if method != "catalyst":
        raise ValueError(f"unknown method {method!r}")
    spark = df.sparkSession
    feats = char_ngram_features(
        df,
        id_col,
        text_col,
        n_max=model.n_max,
        num_buckets=model.num_buckets,
        seed=model.seed,
    )
    tot = feats.groupBy("id").agg(F.sum("cnt").alias("__tot"))
    s1 = (
        feats.join(F.broadcast(model.weights_df(spark)), "bucket")
        .groupBy("id", "__li")
        .agg(F.sum(F.col("cnt") * F.col("__dm")).alias("__s"))
    )
    scores = (
        tot.crossJoin(F.broadcast(model.base_df(spark)))
        .join(s1, ["id", "__li"], "left")
        .select(
            "id",
            "__lang",
            (
                F.col("__tot") * F.col("__lp0")
                + F.coalesce(F.col("__s"), F.lit(0))
            ).alias("__score"),
            F.col("__li"),
        )
    )
    # argmax with deterministic ties: max(struct(score, -idx)) picks the
    # smallest language index (langs are sorted) on equal scores; __lang
    # rides along and never decides (-idx is unique)
    best = scores.groupBy("id").agg(
        F.max(
            F.struct(
                F.col("__score"), (-F.col("__li")).alias("__ni"), "__lang"
            )
        ).alias("__m")
    )
    return best.select(
        F.col("id").alias(id_col),
        F.col("__m.__lang").alias(out_col),
        F.col("__m.__score").alias("score_micro"),
    )


def _predict_lang_kernel(
    df: DataFrame,
    model: LangIdModel,
    id_col: str,
    text_col: str,
    out_col: str,
) -> DataFrame:
    """Map-only Arrow kernel behind predict_lang(method='kernel')."""
    import pandas as pd

    id_type = dict(df.dtypes)[id_col]
    n_max, num_buckets, seed = model.n_max, model.num_buckets, model.seed
    langs = list(model.langs)
    logp0 = list(model.logp0_micro)
    delta_items = list(model.delta_micro.items())

    def run(batches):
        import numpy as np

        # dense (buckets x langs) int64 delta matrix, built once per
        # task from the sparse frozen model
        dense = np.zeros((num_buckets, len(langs)), dtype=np.int64)
        for (b, li), dm in delta_items:
            dense[b, li] = dm
        lp0 = np.asarray(logp0, dtype=np.int64)
        memo: dict[str | tuple[str, ...], int] = {}
        for pdf in batches:
            ids, preds, scores = [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                by = _kernel_doc_buckets(text, n_max, num_buckets, seed, memo)
                if by:
                    bs = np.fromiter(by.keys(), dtype=np.int64, count=len(by))
                    cs = np.fromiter(
                        by.values(), dtype=np.int64, count=len(by)
                    )
                    s = cs @ dense[bs] + int(cs.sum()) * lp0
                else:
                    s = 0 * lp0
                li = int(np.argmax(s))  # first max == smallest index
                ids.append(rid)
                preds.append(langs[li])
                scores.append(int(s[li]))
            yield pd.DataFrame(
                {id_col: ids, out_col: preds, "score_micro": scores}
            )

    from letsearch_spark.session import ensure_min_parallelism

    # the gram kernel is the cost; a 1-row-group local scan must not
    # serialize it onto one task (no-op on well-split inputs)
    return ensure_min_parallelism(df.select(id_col, text_col)).mapInPandas(
        run,
        schema=f"{id_col} {id_type}, {out_col} string, score_micro long",
    )


# ---------------------------------------------------------------- twins


def _twin_grams(text: str | None, n_max: int) -> list[str]:
    t = re.sub(
        r"[ \t\n\x0b\f\r]+", " ", (text or "").strip(" \t\n\x0b\f\r").lower()
    )
    t = f" {t} "
    chars = list(t)
    out: list[str] = []
    for n in range(1, n_max + 1):
        out.extend(
            "".join(chars[i : i + n]) for i in range(len(chars) - n + 1)
        )
    return out


def _twin_bucket(gram: str, seed: int, num_buckets: int) -> int:
    h = int(hashlib.md5(f"{gram}#langid{seed}".encode()).hexdigest()[:15], 16)
    return h % num_buckets


def fit_langid_twin(
    rows: list[tuple[str, str]],
    n_max: int = 3,
    num_buckets: int = 4096,
    alpha: float = 1.0,
    seed: int = 42,
) -> LangIdModel:
    """Pure-Python fit over (lang, text) pairs -- same count maps, same
    _model_from_counts; pinned bit-equal to fit_langid in pytest."""
    counts: dict[str, dict[int, int]] = {}
    for lang, text in rows:
        if lang is None:
            continue
        by = counts.setdefault(lang, {})
        for g in _twin_grams(text, n_max):
            b = _twin_bucket(g, seed, num_buckets)
            by[b] = by.get(b, 0) + 1
    return _model_from_counts(counts, n_max, num_buckets, seed, alpha)


def predict_lang_twin(
    rows: list[tuple[object, str]], model: LangIdModel
) -> list[tuple[object, str, int]]:
    """Pure-Python predict over (id, text) pairs -- exact integer replay
    of predict_lang (same micro-unit sums, same smallest-index ties)."""
    out = []
    for rid, text in rows:
        feats: dict[int, int] = {}
        for g in _twin_grams(text, model.n_max):
            b = _twin_bucket(g, model.seed, model.num_buckets)
            feats[b] = feats.get(b, 0) + 1
        tot = sum(feats.values())
        best = None
        for li, lang in enumerate(model.langs):
            s = tot * model.logp0_micro[li]
            for b, c in feats.items():
                dm = model.delta_micro.get((b, li))
                if dm is not None:
                    s += c * dm
            key = (s, -li)
            if best is None or key > best[0]:
                best = (key, lang, s)
        out.append((rid, best[1], best[2]))
    return out


# ---------------------------------------------------------------- fixture

# Common-word vocabularies for the synthetic multilingual fixture --
# public basic vocabulary, ~10 high-frequency words per language, 26
# languages across latin / cyrillic / greek / CJK / arabic / devanagari
# scripts. Fixture-only: the classifier itself never sees a wordlist.
MULTILINGUAL_VOCAB: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "that", "with", "for", "was", "this"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "auf", "sich"],
    "fr": ["le", "la", "les", "et", "est", "dans", "pour", "que", "une", "avec"],
    "es": ["el", "los", "las", "y", "es", "que", "para", "una", "con", "por"],
    "pt": ["o", "os", "das", "e", "um", "para", "com", "uma", "mais", "como"],
    "it": ["il", "gli", "e", "che", "per", "una", "con", "sono", "della", "anche"],
    "nl": ["de", "het", "en", "van", "een", "dat", "niet", "voor", "zijn", "maar"],
    "sv": ["och", "att", "det", "som", "en", "av", "inte", "den", "har", "till"],
    "da": ["og", "at", "det", "som", "en", "af", "ikke", "den", "har", "til"],
    "no": ["og", "at", "det", "som", "en", "av", "ikke", "jeg", "har", "til"],
    "fi": ["ja", "on", "ei", "että", "se", "hän", "oli", "mutta", "niin", "kun"],
    "pl": ["i", "w", "nie", "na", "się", "jest", "do", "tak", "jak", "ale"],
    "cs": ["a", "je", "se", "na", "to", "že", "ale", "jako", "byl", "pro"],
    "tr": ["ve", "bir", "bu", "için", "ile", "daha", "çok", "gibi", "ama", "olan"],
    "ro": ["și", "de", "la", "cu", "în", "este", "care", "pentru", "mai", "dar"],
    "hu": ["és", "a", "az", "hogy", "nem", "egy", "van", "volt", "mint", "csak"],
    "id": ["yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini", "dari", "akan"],
    "vi": ["và", "của", "là", "có", "không", "được", "trong", "một", "người", "này"],
    "sw": ["na", "ya", "wa", "kwa", "ni", "katika", "za", "hii", "lakini", "kama"],
    "ca": ["el", "i", "de", "que", "és", "per", "amb", "una", "dels", "més"],
    "ru": ["и", "в", "не", "на", "что", "это", "как", "его", "было", "для"],
    "el": ["και", "το", "της", "να", "που", "είναι", "από", "για", "με", "δεν"],
    "ar": ["في", "من", "على", "أن", "إلى", "هذا", "كان", "التي", "لا", "ما"],
    "hi": ["के", "में", "की", "है", "और", "से", "का", "को", "पर", "यह"],
    "zh": ["的", "是", "在", "了", "有", "和", "人", "这", "中", "不"],
    "ja": ["の", "に", "は", "を", "た", "が", "で", "て", "と", "です"],
}


def synthetic_multilingual_corpus(
    langs: list[str] | None = None,
    docs_per_lang: int = 40,
    words_per_doc: int = 30,
    seed: int = 0,
) -> list[tuple[int, str, str]]:
    """Deterministic (doc_id, lang, text) fixture rows: each doc is a
    seeded md5-arithmetic selection from its language's common-word
    vocabulary (the build_wet_bytes fixture-builder pattern -- no RNG
    state, reproducible anywhere)."""
    langs = sorted(MULTILINGUAL_VOCAB) if langs is None else sorted(langs)
    rows = []
    doc_id = 0
    for lang in langs:
        vocab = MULTILINGUAL_VOCAB[lang]
        for d in range(docs_per_lang):
            words = []
            for w in range(words_per_doc):
                h = int(
                    hashlib.md5(
                        f"{lang}/{d}/{w}#ml{seed}".encode()
                    ).hexdigest()[:8],
                    16,
                )
                words.append(vocab[h % len(vocab)])
            rows.append((doc_id, lang, " ".join(words)))
            doc_id += 1
    return rows
