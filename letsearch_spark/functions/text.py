"""Text-analysis scalar functions (north-star operators, BASELINE.json).

All pure Catalyst Column expressions -- no Python in the hot path, so
they run inside whole-stage codegen during the scan. Each has an exact
DuckDB-SQL twin in queries.py for the oracle gate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# stopword regexes for the lang-id heuristic; deterministic tie-break
# priority is en > de > es > fr (see lang_id)
STOPWORDS = {
    "en": r"\b(the|a|of|and|is)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "es": r"\b(el|los|las|y|es)\b",
}

PUNCT_RE = r"[.,;:!?]"


def words(col: Column) -> Column:
    return F.split(F.trim(F.lower(col)), r"\s+")


def word_count(col: Column) -> Column:
    return F.size(words(col))


def token_count_approx(col: Column) -> Column:
    """ceil(words * 1.3) -- the chunker's T4 fallback (chunker.rs:106-114)."""
    return F.ceil(word_count(col) * 1.3).cast("long")


def stopword_count(col: Column, lang: str = "en") -> Column:
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(STOPWORDS[lang]), 0))


def punct_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(PUNCT_RE), 0))


def lang_id(col: Column) -> Column:
    """Stopword-count argmax language-ID with deterministic tie-break."""
    s = {k: stopword_count(col, k) for k in STOPWORDS}
    return (
        F.when(
            (s["en"] == 0) & (s["de"] == 0) & (s["fr"] == 0) & (s["es"] == 0),
            F.lit("und"),
        )
        .when(
            (s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]),
            F.lit("en"),
        )
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]), F.lit("de"))
        .when(s["es"] >= s["fr"], F.lit("es"))
        .otherwise(F.lit("fr"))
    )


def fingerprint(col: Column) -> Column:
    """md5 of whitespace-normalized lowercase text (doc identity hash)."""
    return F.md5(F.regexp_replace(F.trim(F.lower(col)), r"\s+", " "))


# scrub patterns chosen to mean the same thing in Java regex (Spark) and
# DuckDB's RE2: no lookarounds, no backrefs.
#
# Known residual divergence (found by functions/html.py's cross-engine
# fuzz): \b is unicode-word-aware in Java but ASCII in RE2, so a digit
# or latin letter DIRECTLY adjacent to a CJK character sits on an RE2
# boundary but not a Java one (e.g. '地址1.2.3.4' -- RE2 scrubs the IP,
# Java does not). RE2 has no lookaround, so a boundary guard that does
# not CONSUME the neighbor (which would corrupt regexp_replace token
# substitution) cannot be written in the common subset; the \b stays,
# with this caveat documented. The driver corpora are ASCII-adjacent,
# so the oracles replaying these exact strings stay hash-exact; the
# html module's tag patterns, where the same divergence DID bite,
# avoid \b entirely via an explicit tag-end branch.
URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# phone heuristic: optional +country, then 2-4 / 3 / 3-4 digit groups
# with ()-. or space separators -- catches +1 (555) 123-4567,
# 0555-123-456, 5551234567; like all regex phone matchers it can also
# hit long bare digit runs (order ids), which is the right bias for a
# PII scrub
PHONE_RE = r"(\+\d{1,3}[-. ]?)?\(?\d{2,4}\)?[-. ]?\d{3}[-. ]?\d{3,4}\b"


def scrub_text(
    col: Column,
    url_token: str = "<URL>",
    email_token: str = "<EMAIL>",
    ip_token: str = "<IP>",
    phone_token: str = "<PHONE>",
) -> Column:
    """PII/noise scrubbing for training text: URLs, e-mail addresses,
    IPv4 addresses, and phone-shaped numbers replaced by stable
    placeholder tokens, whitespace re-normalized. Order matters and is
    fixed: URLs first (they contain digits and dots), then e-mails,
    then IPs (dotted quads would otherwise half-match the phone rule),
    then phones. Pure Catalyst regexp_replace chain -- runs inside the
    scan."""
    out = F.regexp_replace(col, URL_RE, url_token)
    out = F.regexp_replace(out, EMAIL_RE, email_token)
    out = F.regexp_replace(out, IP_RE, ip_token)
    out = F.regexp_replace(out, PHONE_RE, phone_token)
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def scrub_counts(col: Column) -> tuple[Column, Column, Column, Column]:
    """(n_urls, n_emails, n_ips, n_phones) found in the text -- audit
    companion to :func:`scrub_text`. Counts are taken on the RAW text
    independently, so a dotted quad counts as an IP even though the
    scrub chain would have consumed it had it sat inside a URL."""
    return (
        F.size(F.regexp_extract_all(col, F.lit(URL_RE), 0)).cast("long"),
        F.size(F.regexp_extract_all(col, F.lit(EMAIL_RE), 0)).cast("long"),
        F.size(F.regexp_extract_all(col, F.lit(IP_RE), 0)).cast("long"),
        F.size(F.regexp_extract_all(col, F.lit(PHONE_RE), 0)).cast("long"),
    )


def repetition_stats(col: Column, n: int = 2) -> dict[str, Column]:
    """Within-document repetition signals (the Gopher/C4-style quality
    filters): distinct-word ratio and duplicate n-gram fraction. High
    duplicate fractions flag boilerplate/spam/generation loops. All
    Catalyst expressions; counts are order-invariant so the DuckDB twin
    matches exactly.

    Returns named Columns: n_words, n_distinct_words, dup_word_frac,
    dup_ngram_frac (fractions rounded to 6)."""
    w = words(col)
    n_words = F.size(w)
    n_distinct = F.size(F.array_distinct(w))
    # n-grams as a transform over zipped shifted slices: a lambda that
    # indexed back into `w` would re-evaluate the words() split PER
    # ELEMENT (O(words^2) per doc, see operators/ngram_lm.py); zipping
    # keeps it linear and produces the identical gram strings
    grams = F.when(
        n_words >= n,
        F.transform(
            F.arrays_zip(
                *[F.slice(w, i + 1, n_words - n + 1).alias(f"c{i}") for i in range(n)]
            ),
            lambda s: F.concat_ws(
                " ", *[s.getField(f"c{i}") for i in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_grams = F.size(grams)
    n_distinct_grams = F.size(F.array_distinct(grams))
    dup_word = F.when(
        n_words > 0, F.round(1.0 - n_distinct * 1.0 / n_words, 6)
    ).otherwise(F.lit(0.0))
    dup_gram = F.when(
        n_grams > 0, F.round(1.0 - n_distinct_grams * 1.0 / n_grams, 6)
    ).otherwise(F.lit(0.0))
    return {
        "n_words": n_words.cast("long"),
        "n_distinct_words": n_distinct.cast("long"),
        "dup_word_frac": dup_word,
        "dup_ngram_frac": dup_gram,
    }


def quality_score(col: Column) -> Column:
    """Composite [0,1]-ish quality: length, stopword ratio, punctuation."""
    n_words = word_count(col)
    n_chars = F.length(col)
    return F.round(
        F.least(F.lit(1.0), n_words / 100.0) * 0.4
        + (stopword_count(col) * 1.0 / n_words) * 0.3
        + (1.0 - punct_count(col) * 1.0 / n_chars) * 0.3,
        6,
    )


# ---------------- Gopher-style quality filter ----------------

# exact-token stopword list for the "contains real language" rule
# (distinct from the regex sets above, which serve lang-id scoring)
STOP_TOKENS = ("the", "a", "an", "of", "and", "is", "to", "in", "that", "for")

# bullet / trailing-ellipsis line shapes; plain character classes so the
# Java (Spark) and RE2 (DuckDB) engines agree
BULLET_RE = r"^\s*[-*+]"
ELLIPSIS_RE = r"\.\.\.\s*$"
SYMBOL_RE = r"#|\.\.\."


def gopher_flags(
    col: Column,
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_tokens: int = 2,
) -> dict[str, Column]:
    """Gopher-style document quality rules (Rae et al. 2021, table A1)
    as pure Catalyst columns -- the standard pretraining-corpus filter
    family: length bounds, mean word length, symbol-to-word ratio,
    bullet/ellipsis line shapes, alphabetic-word fraction, and a
    real-language stopword floor.

    Returns the measured metrics plus one boolean per rule and the
    conjunction ``passes``. Every expression has an exact DuckDB twin
    (list ops over the same splits), so the filter is oracle-verifiable.
    Word stats run on the same lowercased whitespace split as the rest
    of this module; ``min_words`` defaults lower than Gopher's 50
    because chunk-sized inputs are the common case here -- pass the
    paper's thresholds for raw-page filtering.
    """
    w = words(col)
    n_words = F.size(w)
    lines = F.split(col, r"\n")
    n_lines = F.size(lines)

    mean_wl = F.aggregate(
        F.transform(w, lambda x: F.length(x)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ) * 1.0 / n_words
    symbol_ratio = (
        F.size(F.regexp_extract_all(col, F.lit(SYMBOL_RE), 0)) * 1.0 / n_words
    )
    bullet_frac = (
        F.size(F.filter(lines, lambda x: x.rlike(BULLET_RE))) * 1.0 / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda x: x.rlike(ELLIPSIS_RE))) * 1.0 / n_lines
    )
    alpha_frac = (
        F.size(F.filter(w, lambda x: x.rlike(r"[a-z]"))) * 1.0 / n_words
    )
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(w), F.array(*[F.lit(s) for s in STOP_TOKENS])
        )
    )

    flags = {
        "n_words": n_words.cast("long"),
        "mean_word_len": F.round(mean_wl, 6),
        "symbol_ratio": F.round(symbol_ratio, 6),
        "bullet_frac": F.round(bullet_frac, 6),
        "ellipsis_frac": F.round(ellipsis_frac, 6),
        "alpha_frac": F.round(alpha_frac, 6),
        "n_stop_tokens": n_stop.cast("long"),
        "ok_words": (n_words >= min_words) & (n_words <= max_words),
        "ok_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "ok_symbols": symbol_ratio <= max_symbol_ratio,
        "ok_bullets": bullet_frac <= max_bullet_frac,
        "ok_ellipsis": ellipsis_frac <= max_ellipsis_frac,
        "ok_alpha": alpha_frac >= min_alpha_frac,
        "ok_stop": n_stop >= min_stop_tokens,
    }
    flags["passes"] = (
        flags["ok_words"]
        & flags["ok_word_len"]
        & flags["ok_symbols"]
        & flags["ok_bullets"]
        & flags["ok_ellipsis"]
        & flags["ok_alpha"]
        & flags["ok_stop"]
    )
    return flags


# ---------------- C4-style cleaning ----------------

# a line "ends in a sentence" if it closes with terminal punctuation,
# optionally followed by a straight/curly quote (double or single --
# smart-quoted text ends ".’"); plain classes so Java (Spark) and
# RE2 (DuckDB) agree
C4_TERMINAL_RE = "[.!?][\"”'’]?\\s*$"


def c4_clean_lines(col: Column, min_line_words: int = 5) -> Column:
    """C4's LINE-level cleaning (Raffel et al. 2020 §2.2) as one
    Catalyst expression: keep only lines that end in terminal
    punctuation, carry at least ``min_line_words`` words, and do not
    mention 'javascript' (the cookie/JS-warning boilerplate tell);
    return the kept lines re-joined with newlines.

    Pure per-row array work over the line split -- map-side only, no
    shuffle, no UDF; at 100 TB this is a free pass fused into whatever
    scan follows. Compose with page-level :func:`c4_flags` for the
    full C4 recipe (the two halves are separable on purpose: line
    cleaning REWRITES text, page flags only filter)."""
    lines = F.split(col, r"\n")
    kept = F.filter(
        lines,
        lambda x: x.rlike(C4_TERMINAL_RE)
        & (F.size(words(x)) >= min_line_words)
        & ~F.lower(x).contains("javascript"),
    )
    return F.array_join(kept, "\n")


def c4_flags(
    col: Column,
    min_sentences: int = 3,
    blocklist: tuple[str, ...] = (),
) -> dict[str, Column]:
    """C4's PAGE-level filters (Raffel et al. 2020 §2.2) as pure
    Catalyst columns, same shape as :func:`gopher_flags`: sentence
    floor (terminal-punctuation count), no 'lorem ipsum' placeholder
    text, no curly brace (code tell), and no word from ``blocklist``
    (C4 uses the public "dirty/naughty" word list; supply your own --
    the default is empty so the rule passes vacuously).

    Returns measured metrics, one boolean per rule, and the
    conjunction ``passes``. Run on :func:`c4_clean_lines` output to
    reproduce the C4 order (lines first, then pages). Every expression
    has an exact DuckDB twin, so the filter is oracle-verifiable."""
    low = F.lower(col)
    n_sentences = F.size(
        F.regexp_extract_all(col, F.lit("[.!?][\"”'’]?(\\s|$)"), 0)
    )
    has_lorem = low.contains("lorem ipsum")
    has_brace = col.contains("{")
    single = [w.lower() for w in blocklist if " " not in w]
    phrases = [w.lower() for w in blocklist if " " in w]
    # single words match whitespace tokens with edge punctuation
    # stripped (a sentence-final 'badword.' must still match); phrases
    # match as substrings -- C4's public blocklist mixes both kinds
    has_blocked = F.lit(False)
    if single:
        stripped = F.transform(
            words(col),
            lambda w: F.regexp_replace(w, r"^[^a-z0-9]+|[^a-z0-9]+$", ""),
        )
        has_blocked = F.arrays_overlap(
            F.array_distinct(stripped),
            F.array(*[F.lit(w) for w in single]),
        )
    for ph in phrases:
        has_blocked = has_blocked | low.contains(ph)
    flags = {
        "n_sentences": n_sentences.cast("long"),
        "has_lorem_ipsum": has_lorem,
        "has_curly_brace": has_brace,
        "has_blocked_word": has_blocked,
        "ok_sentences": n_sentences >= min_sentences,
        "ok_lorem": ~has_lorem,
        "ok_brace": ~has_brace,
        "ok_blocklist": ~has_blocked,
    }
    flags["passes"] = (
        flags["ok_sentences"]
        & flags["ok_lorem"]
        & flags["ok_brace"]
        & flags["ok_blocklist"]
    )
    return flags


# ---------------- URL canonicalization ----------------

# tracking parameters stripped by normalize_url (the web-corpus dedup
# convention: utm_* campaign tags and click ids never identify content)
_TRACKING_PARAM_RE = r"(?:utm_[a-zA-Z]+|gclid|fbclid|msclkid|ref_src)=[^&#\s]*"


def url_host(col: Column) -> Column:
    """Lowercased host (no userinfo, no port, no leading www.) of a URL
    column -- the grouping key for host-level splits (hash the host,
    not the URL, to keep whole sites on one side of a train/test
    split), per-site aggregation, and blocklist matching. Userinfo is
    stripped (r8 review catch: ``https://x@blocked.com/`` must not
    dodge a blocklist keyed on the real host)."""
    auth = F.regexp_extract(
        col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1
    )
    host = F.lower(F.regexp_replace(auth, r"^.*@", ""))
    # bracketed IPv6 authority (ADVICE r8): '[::1]:8080' is the inner
    # literal '::1' -- the generic ':port' strip below would keep the
    # brackets and eat the last hextet instead
    ipv6 = F.regexp_extract(host, r"^\[([^\]]+)\]", 1)
    host = F.regexp_replace(host, r":\d*$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    return F.when(F.length(ipv6) > 0, ipv6).otherwise(host)


def normalize_url(col: Column) -> Column:
    """Canonical URL for exact URL-level dedup of web corpora: the same
    page crawled twice usually differs only in tracking params, case of
    scheme/host, fragments, default ports, or a trailing slash.

    Steps (pure Catalyst regexp chain, order matters):
    fragment off -> tracking params off (incl. dangling separators) ->
    scheme+host lowercased, www. and default ports dropped -> empty
    query and trailing slash trimmed.

    Deliberately NOT touching path case or non-tracking param order --
    those can be semantic.
    """
    u = F.regexp_replace(col, r"#.*$", "")  # fragment
    u = F.regexp_replace(u, r"(?<=[?&])" + _TRACKING_PARAM_RE + r"&?", "")
    u = F.regexp_replace(u, r"[?&]$", "")  # dangling separator
    scheme_host = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)", 1))
    scheme_host = F.regexp_replace(scheme_host, r"^(https?://)www\.", "$1")
    scheme_host = F.regexp_replace(scheme_host, r"^(http://[^/?#:]+):80$", "$1")
    scheme_host = F.regexp_replace(scheme_host, r"^(https://[^/?#:]+):443$", "$1")
    rest = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+", "")
    out = F.concat(scheme_host, rest)
    return F.regexp_replace(out, r"/$", "")


def url_quality_flags(
    col: Column,
    blocked_hosts: Sequence[str] = (),
    blocked_patterns: Sequence[str] = (),
    max_path_depth: int = 12,
    max_host_digit_ratio: float = 0.5,
) -> Column:
    """URL-level page filtering (the RefinedWeb/C4 step that runs
    BEFORE any text is read -- rejecting a page by its URL costs zero
    bytes of content IO): a struct of per-rule flags plus ``passes``.

    Rules (all pure Catalyst; one projection over the scan):

    * ``host_blocked`` -- host (via :func:`url_host`, so www./port
      spellings can't dodge the list) is in ``blocked_hosts``
      (curated lists are small -> an in-plan literal IN; corpus-scale
      blocklists should broadcast-join on url_host instead);
    * ``pattern_hit`` -- the lowercased URL matches any of
      ``blocked_patterns`` (Java-regex fragments, OR-joined);
    * ``too_deep`` -- more than ``max_path_depth`` path segments
      (crawler traps / calendar spirals);
    * ``digit_host`` -- digit share of the host above
      ``max_host_digit_ratio`` (throwaway/spam hosts);
    * ``no_host`` -- the URL does not parse to a host at all.

    ``passes`` = none of the above. Null URLs fail with ``no_host``.
    """
    # null URLs must FAIL (no_host), not propagate NULL flags
    host = url_host(F.coalesce(col, F.lit("")))
    low = F.lower(F.coalesce(col, F.lit("")))
    rules = {
        "no_host": F.length(host) == 0,
        "host_blocked": (
            host.isin([h.lower() for h in blocked_hosts])
            if blocked_hosts
            else F.lit(False)
        ),
        "pattern_hit": (
            low.rlike("|".join(f"(?:{p})" for p in blocked_patterns))
            if blocked_patterns
            else F.lit(False)
        ),
        "too_deep": F.size(
            F.split(
                F.regexp_replace(
                    F.regexp_extract(low, r"^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)", 1),
                    r"/$",
                    "",
                ),
                "/",
            )
        )
        - 1
        > max_path_depth,
        "digit_host": F.when(
            F.length(host) == 0, F.lit(False)
        ).otherwise(
            F.length(F.regexp_replace(host, r"[^0-9]", ""))
            / F.length(host)
            > max_host_digit_ratio
        ),
    }
    passes = F.lit(True)
    for c in rules.values():
        passes = passes & ~c
    return F.struct(
        *[c.alias(name) for name, c in rules.items()],
        passes.alias("passes"),
    )


# control/format characters that break tokenizers and dedup hashing:
# C0 (minus \t\n\r AND the whitespace-functioning VT \x0B / FF \x0C),
# DEL+C1 except NEL \x85, zero-widths/joiners, BiDi marks, word joiner,
# BOM, soft hyphen. VT/FF/NEL function as separators in real text
# (form feeds in PDF extractions!) -- deleting them would merge the
# words they separate, so they belong to the WHITESPACE step below.
_CONTROL_RE = (
    "[\\x00-\\x08\\x0E-\\x1F\\x7F-\\x84\\x86-\\x9F"
    "\\u200B-\\u200F\\u2060\\uFEFF\\u00AD]"
)
# every Unicode whitespace run -> one ASCII space (\s in Java regex is
# ASCII-only and already covers \x0B and \f; add NEL, NBSP, ogham,
# en/em spaces, line/para separators, ideographic space)
_WS_RE = (
    "[\\s\\u0085\\u00A0\\u1680\\u2000-\\u200A"
    "\\u2028\\u2029\\u202F\\u205F\\u3000]+"
)


def normalize_text_column(
    col: Column,
    form: str = "NFKC",
    strip_control: bool = True,
    collapse_whitespace: bool = True,
) -> Column:
    """Training-corpus text canonicalization, pure Catalyst:

    * Unicode normalization (NFKC folds full-width forms, ligatures,
      and compatibility glyphs -- the form web-corpus pipelines
      standardize on). Spark has no builtin normalizer, so this one
      step is an Arrow-batched pandas UDF over stdlib ``unicodedata``
      -- the documented exception to this module's Catalyst-only rule;
      pass ``form=None`` for a fully JVM-side plan;
    * control/format-character strip (C0/C1, zero-widths, BiDi marks,
      BOM, soft hyphen) -- Catalyst regexp;
    * whitespace collapse (any Unicode whitespace run to one ASCII
      space) + trim -- Catalyst regexp.

    Each step is a flag so callers canonicalize exactly as far as their
    dedup/oracle contract allows (exact_dedup's normalize_text only
    lowercases and collapses ASCII whitespace -- running this first
    makes visually-identical unicode variants dedup together)."""
    out = col
    if form is not None:  # '' is an error, not a silent skip
        if form not in ("NFC", "NFD", "NFKC", "NFKD"):
            raise ValueError(f"unknown unicode form {form!r}")
        out = _unicode_normalize_udf(form)(out)
    if strip_control:
        out = F.regexp_replace(out, _CONTROL_RE, "")
    if collapse_whitespace:
        out = F.trim(F.regexp_replace(out, _WS_RE, " "))
    return out


def _unicode_normalize_udf(form: str):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s):  # type: ignore[no-untyped-def]
        import unicodedata

        return s.map(
            lambda v: unicodedata.normalize(form, v) if v is not None else None
        )

    return _norm


# ---------------- deflate compressibility (quality signal) ------------


def compression_stats(col: Column, level: int = 6) -> dict[str, Column]:
    """zlib-deflate compressibility of the UTF-8 text -- the classic
    gibberish/boilerplate detector (used by CCNet-lineage pipelines):
    highly repetitive machine text compresses far below prose
    (ratio -> 0), while random/encrypted blobs do not compress at all
    (ratio -> ~1+). Like unicode normalization this is the documented
    exception to the module's Catalyst-only rule: one Arrow-batched
    stdlib-``zlib`` UDF computing (raw_bytes, zlib_bytes); the ratio is
    derived JVM-side. Deterministic for a fixed zlib (same container
    serves executors and any oracle twin).

    Returns ``raw_bytes`` / ``zlib_bytes`` (long; 0 for null/empty) and
    ``compression_ratio`` (double, round-6; 0.0 for empty text).
    """
    from pyspark.sql.functions import pandas_udf

    lvl = int(level)

    @pandas_udf("struct<raw_bytes: long, zlib_bytes: long>")
    def _sizes(s):  # type: ignore[no-untyped-def]
        import zlib

        import pandas as pd

        def one(v):
            if not isinstance(v, str) or v == "":
                return {"raw_bytes": 0, "zlib_bytes": 0}
            b = v.encode("utf-8")
            return {
                "raw_bytes": len(b),
                "zlib_bytes": len(zlib.compress(b, lvl)),
            }

        return pd.DataFrame([one(v) for v in s])

    st = _sizes(col)
    raw = st.getField("raw_bytes")
    comp = st.getField("zlib_bytes")
    ratio = F.when(raw == 0, F.lit(0.0)).otherwise(
        F.round(comp.cast("double") / raw.cast("double"), 6)
    )
    return {
        "raw_bytes": raw,
        "zlib_bytes": comp,
        "compression_ratio": ratio,
    }


def compression_flags(
    col: Column,
    min_ratio: float = 0.25,
    max_ratio: float = 1.05,
    level: int = 6,
) -> dict[str, Column]:
    """Boolean filter over :func:`compression_stats`: drop pages that
    compress too well (templated/repeated boilerplate below
    ``min_ratio``) or not at all (non-linguistic payloads above
    ``max_ratio``). Empty text fails. Returns the stats plus
    ``ratio_ok`` and the conjunction ``passes``."""
    stats = compression_stats(col, level=level)
    ratio = stats["compression_ratio"]
    ok = (
        (stats["raw_bytes"] > 0)
        & (ratio >= float(min_ratio))
        & (ratio <= float(max_ratio))
    )
    return {**stats, "ratio_ok": ok, "passes": ok}


# --------------------------------------------------------------- FIM


def _h60(col: Column) -> Column:
    """60-bit integer off md5 -- the repo's standard deterministic hash
    (same construction as shuffle_order / the oracle _MD5_60_SQL)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def fim_transform(
    id_col: Column,
    text_col: Column,
    seed: int = 42,
    rate: float = 0.5,
    mode: str = "psm",
    prefix_tok: str = "<fim_prefix>",
    suffix_tok: str = "<fim_suffix>",
    middle_tok: str = "<fim_middle>",
) -> dict[str, Column]:
    """Fill-in-the-middle transform (Bavarian et al. 2022, "Efficient
    Training of Language Models to Fill in the Middle"): a seeded,
    deterministic fraction (``rate``) of documents is split at two
    pseudo-random CHARACTER positions into (prefix, middle, suffix) and
    re-emitted with sentinel tokens so an autoregressive model learns
    infilling -- the standard data-level transform for code models.

    Pure Catalyst (md5 split points + substrings -- no UDF, stays in
    whole-stage codegen; at 100 TB this is a map-only rewrite, zero
    shuffles). Selection and split points hash ``(id, seed)``, so the
    transform is reproducible row-locally under any partitioning, and
    ``seed`` variants give independent FIM epochs.

    mode='psm': ``<fim_prefix>P<fim_suffix>S<fim_middle>M`` (the model
    generates M after seeing P and S). mode='spm':
    ``<fim_suffix>S<fim_prefix>P<fim_middle>M`` (the paper's SPM
    variant -- suffix first; this implementation keeps the explicit
    prefix sentinel rather than the joined encoding).

    Returns {'applied': bool Column, 'text': string Column} -- 'text'
    is the original text for unselected/empty/null rows.
    """
    if mode not in ("psm", "spm"):
        raise ValueError(f"mode must be psm|spm, got {mode!r}")
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    sid = id_col.cast("string")
    n = F.length(text_col)
    selected = (
        _h60(F.concat(sid, F.lit(f"#fimsel#{seed}"))) % F.lit(1_000_000)
    ) < F.lit(int(rate * 1_000_000))
    applied = selected & text_col.isNotNull() & (n > 0)
    u1 = _h60(F.concat(sid, F.lit(f"#fim1#{seed}"))) % (n + 1)
    u2 = _h60(F.concat(sid, F.lit(f"#fim2#{seed}"))) % (n + 1)
    lo, hi = F.least(u1, u2), F.greatest(u1, u2)
    prefix = F.substring(text_col, F.lit(1), lo)
    middle = F.substring(text_col, lo + 1, hi - lo)
    suffix = F.substring(text_col, hi + 1, n - hi)
    if mode == "psm":
        rewritten = F.concat(
            F.lit(prefix_tok), prefix,
            F.lit(suffix_tok), suffix,
            F.lit(middle_tok), middle,
        )
    else:
        rewritten = F.concat(
            F.lit(suffix_tok), suffix,
            F.lit(prefix_tok), prefix,
            F.lit(middle_tok), middle,
        )
    return {
        "applied": applied,
        "text": F.when(applied, rewritten).otherwise(text_col),
    }


def _exact_div(a: Column, b: Column) -> Column:
    """Exact integer floor-division of non-negative long columns:
    (a - a % b) / b -- the double division is exact because the
    numerator is an exact multiple (and < 2^53 for every caller), so
    the result matches Python's // bit-for-bit."""
    return ((a - (a % b)) / b).cast("long")


def span_corruption(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    density: float = 0.15,
    mean_span: int = 3,
    min_words: int = 1,
):
    """T5-style span corruption (Raffel et al. 2020 §3.1.4): drop
    ~``density`` of each document's words in spans of mean length
    ``mean_span``, replacing each span with a ``<extra_id_i>`` sentinel
    in the INPUT and emitting the dropped spans (each prefixed by its
    sentinel, closed by a final sentinel) as the TARGET -- the
    denoising objective the T5 family pretrains on, as
    :func:`fim_transform` is for the FIM family.

    Deterministic segment-stratified selection (documented
    simplification of the paper's random sampling, same md5 discipline
    as fim_transform): the word sequence [0, n) splits into
    ``n_spans = max(1, n*density // mean_span)`` equal segments of
    ``seg = n // n_spans`` words; span i lives inside segment i with
    length ``1 + h(id,seed,i) % min(2*mean_span-1, seg)`` (mean ~=
    mean_span, never crossing a segment, so spans can NEVER overlap by
    construction) and an h-chosen start. Everything hashes (id, seed),
    so the rewrite is row-local, reproducible under any partitioning,
    and distinct seeds give independent corruption epochs.

    DataFrame-in/DataFrame-out (unlike the cheap Column-style
    fim_transform) ON PURPOSE: the word array, the per-row scalars and
    the span table materialize as real columns between projections, so
    lambdas reference ATTRIBUTES -- a Column-style expression tree
    would re-evaluate the split() and the md5 span math once PER WORD
    ELEMENT inside the higher-order functions (the O(words^2) trap
    repetition_stats documents; the first cut measured 325 s at sf0.1
    vs ~3 s for this shape). Still pure Catalyst: split / sequence /
    transform / filter / array_join, no UDF, map-only, zero shuffles.

    Words are single-space splits (split('a  b') keeps the empty
    token, so join(split(x)) == x losslessly and non-span text is
    preserved byte-for-byte). :func:`span_corruption_twin` is the
    sequential reference implementation (computed-oracle/test twin).

    Short-document floor (r9 review catch, stated honestly): n_spans
    floors at 1, so a document shorter than ``mean_span / density``
    words (~20 at the defaults) gets exactly one span and a REALIZED
    corruption rate above ``density`` -- a 1-word doc always loses its
    only word. Corpora of short texts (titles, chat turns) should set
    ``min_words`` (documents below it pass through, applied=false) or
    tune density/mean_span to their length distribution.

    Returns ``df`` plus (applied bool, input string, target string);
    null/empty/short rows pass through with input = original text and
    a null target. Internal __sc_* columns are dropped.
    """
    if not 0.0 < density <= 1.0:
        raise ValueError(f"density must be in (0, 1], got {density}")
    if mean_span < 1:
        raise ValueError(f"mean_span must be >= 1, got {mean_span}")
    if min_words < 1:
        raise ValueError(f"min_words must be >= 1, got {min_words}")
    rmic = int(density * 1_000_000)
    den = mean_span * 1_000_000
    sid = F.col(id_col).cast("string")
    text = F.col(text_col)

    out = df.withColumn("__sc_words", F.split(text, " "))
    n = F.size("__sc_words").cast("long")
    out = out.withColumn("__sc_n", n)
    out = out.withColumn(
        "__sc_nspans",
        F.greatest(
            F.lit(1).cast("long"),
            _exact_div(F.col("__sc_n") * F.lit(rmic), F.lit(den)),
        ),
    )
    out = out.withColumn(
        "__sc_seg", _exact_div(F.col("__sc_n"), F.col("__sc_nspans"))
    )
    maxlen = F.least(
        F.lit(2 * mean_span - 1).cast("long"), F.col("__sc_seg")
    )
    seg = F.col("__sc_seg")

    def _len_i(i):
        return 1 + _h60(
            F.concat(sid, F.lit(f"#scL#{seed}#"), i.cast("string"))
        ) % maxlen

    def _start_i(i, ln):
        return i * seg + _h60(
            F.concat(sid, F.lit(f"#scP#{seed}#"), i.cast("string"))
        ) % (seg - ln + 1)

    # one md5 pass over the SPANS (n_spans ~= n*density/mean_span), not
    # the words: (start, end) per span, materialized once per row
    out = out.withColumn(
        "__sc_spans",
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.col("__sc_nspans") - 1),
            lambda i: F.struct(
                _start_i(i, _len_i(i)).alias("st"),
                (_start_i(i, _len_i(i)) + _len_i(i)).alias("en"),
            ),
        ),
    )

    def _sentinel(i):
        return F.concat(F.lit("<extra_id_"), i.cast("string"), F.lit(">"))

    spans = F.col("__sc_spans")
    words = F.col("__sc_words")
    # token per word index: attribute references only inside the
    # lambda (the zip carries (word, j); spans/seg/n_spans are row
    # fields) -- linear work per row
    zipped = F.arrays_zip(
        words.alias("w"),
        F.sequence(F.lit(0).cast("long"), F.col("__sc_n") - 1).alias("j"),
    )

    def _token(s):
        w = s.getField("w")
        j = s.getField("j")
        i = _exact_div(j, seg)
        sp = F.element_at(spans, (i + 1).cast("int"))
        outside = (i >= F.col("__sc_nspans")) | (j < sp.getField("st")) | (
            j >= sp.getField("en")
        )
        return F.when(outside, w).when(j == sp.getField("st"), _sentinel(i))

    input_col = F.array_join(
        F.filter(F.transform(zipped, _token), lambda t: t.isNotNull()), " "
    )
    pieces = F.transform(
        F.sequence(F.lit(0).cast("long"), F.size(spans).cast("long") - 1),
        lambda i: F.concat(
            _sentinel(i),
            F.lit(" "),
            F.array_join(
                F.slice(
                    words,
                    (
                        F.element_at(spans, (i + 1).cast("int")).getField("st")
                        + 1
                    ).cast("int"),
                    (
                        F.element_at(spans, (i + 1).cast("int")).getField("en")
                        - F.element_at(spans, (i + 1).cast("int")).getField(
                            "st"
                        )
                    ).cast("int"),
                ),
                " ",
            ),
        ),
    )
    target_col = F.concat(
        F.array_join(pieces, " "),
        F.lit(" "),
        _sentinel(F.col("__sc_nspans")),
    )
    applied = (
        text.isNotNull()
        & (F.length(text) > 0)
        & (F.col("__sc_n") >= min_words)
    )
    out = out.withColumn("applied", applied)
    out = out.withColumn(
        "input", F.when(applied, input_col).otherwise(text)
    )
    out = out.withColumn("target", F.when(applied, target_col))
    return out.drop(
        "__sc_words", "__sc_n", "__sc_nspans", "__sc_seg", "__sc_spans"
    )


def span_corruption_twin(
    doc_id,
    text,
    seed: int = 42,
    density: float = 0.15,
    mean_span: int = 3,
    min_words: int = 1,
):
    """Sequential reference twin of :func:`span_corruption` -- the
    computed-oracle/test implementation (hashlib md5, same arithmetic
    to the bit). Returns (applied, input, target)."""
    import hashlib

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)

    if text is None or len(text) == 0:
        return (False, text, None)
    sid = str(doc_id)
    words = text.split(" ")
    n = len(words)
    if n < min_words:
        return (False, text, None)
    n_spans = max(1, (n * int(density * 1_000_000)) // (mean_span * 1_000_000))
    seg = n // n_spans
    max_len = min(2 * mean_span - 1, seg)
    spans = []
    for i in range(n_spans):
        ln = 1 + h60(f"{sid}#scL#{seed}#{i}") % max_len
        st = i * seg + h60(f"{sid}#scP#{seed}#{i}") % (seg - ln + 1)
        spans.append((st, ln))
    toks = []
    for j, w in enumerate(words):
        i = j // seg
        if i >= n_spans or not (spans[i][0] <= j < spans[i][0] + spans[i][1]):
            toks.append(w)
        elif j == spans[i][0]:
            toks.append(f"<extra_id_{i}>")
    pieces = [
        f"<extra_id_{i}> " + " ".join(words[st : st + ln])
        for i, (st, ln) in enumerate(spans)
    ]
    return (
        True,
        " ".join(toks),
        " ".join(pieces) + f" <extra_id_{n_spans}>",
    )
