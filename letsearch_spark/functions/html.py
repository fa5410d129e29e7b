"""HTML -> text extraction as pure Catalyst expressions.

Web-crawl training pipelines extract page text BEFORE the C4/Gopher
cleaning stages (`functions/text.py c4_clean_lines`, `gopher_flags`);
this module supplies that step as a fixed chain of ``regexp_replace``
expressions, so extraction runs inside the parquet scan with zero UDFs
and zero shuffles -- the same scan-only shape the plan gate pins for
`c4_page_filter`.

Every pattern is written in the common subset of Java regex (Spark) and
RE2 (DuckDB): inline ``(?is)`` flags and lazy quantifiers only, NO
backreferences (RE2 lacks them -- hence separate script/style patterns
instead of a ``</\\1>`` pair). The DuckDB oracle replays the identical
chain, so the extraction is hash-verified cross-engine like every other
contract entry.

Extraction semantics (deliberately trafilatura-lite -- deterministic
and cross-engine, not a browser):

1. ``<script>``/``<style>`` elements are dropped WITH their content;
2. HTML comments dropped;
3. block-level tags (p/div/br/li/headings/tr/...) become newlines, so
   block boundaries survive as line boundaries for the line-based
   cleaners downstream;
4. every remaining tag becomes a space (inline tags must not glue
   ``hello<b>world</b>`` into ``helloworld``);
5. the five ubiquitous entities (&lt; &gt; &quot; &#39; &nbsp;) decode
   first, ``&amp;`` LAST so ``&amp;lt;`` decodes to the literal
   ``&lt;`` and not ``<`` (single-pass decode, the standard order);
6. whitespace normalizes: runs of spaces/tabs/CRs collapse to one
   space, space-padded newlines tighten, newline runs collapse to one.

No reference analog (SURVEY.md §2.7 north-star family); the rule set
follows the C4 paper's preprocessing description (Raffel et al. 2020)
and common crawl-extraction practice.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The common subset is narrower than it looks: \b is UNICODE-word-aware
# in Java but ASCII in RE2 ('<div世界>' matches RE2's <div\b but not
# Java's -- found by the cross-engine fuzz test), and \s includes \x0B
# in Java but not RE2. So tag-name ends are spelled as an explicit
# (>|[separator][^>]*>) branch -- no \b, no lookahead (RE2 has
# neither backreferences nor lookahead) -- and whitespace inside tag
# patterns is the explicit class below.
_WS = r"[ \t\n\r\f]"
# tag name followed by an immediate '>' or a separator + attributes
_TAG_END = rf"(?:>|[{_WS[1:-1]}/][^>]*>)"

# Elements whose CONTENT is noise, not text. RE2 has no backreferences,
# so each element gets its own literal close-tag pattern.
_DROP_CONTENT_RES = [
    rf"(?is)<script{_TAG_END}.*?</script{_WS}*>",
    rf"(?is)<style{_TAG_END}.*?</style{_WS}*>",
]
_COMMENT_RE = r"(?s)<!--.*?-->"
# Tags that end a text block in every browser's default stylesheet --
# enough structure for the downstream line-based cleaners.
_BLOCK_TAG_RE = (
    r"(?i)</?(?:p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|td|th|table|"
    r"blockquote|pre|section|article|header|footer|nav|aside|form|"
    rf"fieldset|hr|dl|dt|dd){_TAG_END}"
)
_ANY_TAG_RE = r"(?s)<[^>]+>"
# (entity, replacement) in decode order; &amp; must stay LAST
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

_TITLE_RE = rf"(?is)<title{_TAG_END}(.*?)</title{_WS}*>"
_LINK_RE = rf"(?i)<a{_WS}[^>]*href{_WS}*="


def html_to_text(col: Column) -> Column:
    """Extract visible text from an HTML column -- the fixed
    regexp_replace chain documented in the module docstring. Scan-only:
    no UDF, no shuffle."""
    out = F.coalesce(col, F.lit(""))
    for pat in _DROP_CONTENT_RES:
        out = F.regexp_replace(out, pat, "")
    out = F.regexp_replace(out, _COMMENT_RE, "")
    out = F.regexp_replace(out, _BLOCK_TAG_RE, "\n")
    out = F.regexp_replace(out, _ANY_TAG_RE, " ")
    for ent, repl in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(repl))
    out = F.regexp_replace(out, r"[ \t\r]+", " ")
    out = F.regexp_replace(out, r" ?\n ?", "\n")
    out = F.regexp_replace(out, r"\n+", "\n")
    # trim strips only spaces in both engines; edge newlines go by regex
    out = F.regexp_replace(out, r"^\n+|\n+$", "")
    return F.trim(out)


def html_title(col: Column) -> Column:
    """First <title> element's text (entity-decoded, whitespace
    collapsed); empty string when absent."""
    t = F.regexp_extract(F.coalesce(col, F.lit("")), _TITLE_RE, 1)
    for ent, repl in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(repl))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def html_link_count(col: Column) -> Column:
    """Number of <a href=...> anchors -- the link-density signal
    boilerplate classifiers key on (nav/footer blocks are link-dense,
    body text is not)."""
    return F.size(
        F.regexp_extract_all(F.coalesce(col, F.lit("")), F.lit(_LINK_RE), 0)
    ).cast("long")


def html_link_density(col: Column) -> Column:
    """Links per extracted word (0.0 for empty pages), rounded to 6 --
    the page-level keep/drop signal: > ~0.5 is usually navigation."""
    text = html_to_text(col)
    n_words = F.size(F.split(F.trim(text), r"\s+"))
    n_words = F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(n_words)
    return F.round(
        html_link_count(col)
        / F.when(n_words > 0, n_words.cast("double")).otherwise(F.lit(None)),
        6,
    )


def oracle_sql_chain(x: str) -> str:
    """The DuckDB replay of :func:`html_to_text` over SQL expression
    ``x`` -- kept HERE beside the Spark chain so the two cannot drift
    silently (queries.py composes it into the contract oracle)."""
    out = f"coalesce({x}, '')"
    for pat in _DROP_CONTENT_RES:
        out = f"regexp_replace({out}, '{pat}', '', 'g')"
    out = f"regexp_replace({out}, '{_COMMENT_RE}', '', 'g')"
    out = f"regexp_replace({out}, '{_BLOCK_TAG_RE}', chr(10), 'g')"
    out = f"regexp_replace({out}, '(?s)<[^>]+>', ' ', 'g')"
    for ent, repl in _ENTITIES:
        r = repl.replace("'", "''")
        out = f"replace({out}, '{ent}', '{r}')"
    out = f"regexp_replace({out}, '[ \\t\\r]+', ' ', 'g')"
    out = f"regexp_replace({out}, ' ?\\n ?', chr(10), 'g')"
    out = f"regexp_replace({out}, '\\n+', chr(10), 'g')"
    out = f"regexp_replace({out}, '^\\n+|\\n+$', '', 'g')"
    return f"trim({out})"
