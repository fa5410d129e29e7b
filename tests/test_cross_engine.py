"""The Spark-vs-DuckDB oracle comparisons rest on expressions meaning
the same thing in Java regex/semantics and DuckDB's RE2/utf8proc. The
common subset is narrower than it looks; this file PINS the known
divergence classes (so they are visible, tested boundaries instead of
latent surprises) and proves the subset the oracles actually rely on
is exact.

Known divergent constructs (found by the round-6 fuzz sweep; each is
either avoided in shared patterns or documented at its use site):

1. ``\\b`` -- unicode-word-aware in Java, ASCII in RE2. Avoided in
   functions/html.py (explicit tag-end branch); documented for the
   scrub IP/phone patterns (functions/text.py) where RE2's missing
   lookaround leaves no non-consuming alternative.
2. ``\\s`` -- Java includes \\x0B, RE2 does not.
3. ``lower()`` -- Java does full unicode case mapping with context
   (Turkish dotted İ -> 'i' + combining dot; Greek final sigma);
   DuckDB's utf8proc does simple mapping (İ -> 'i', Σ -> σ always).

The driver corpora are ASCII-adjacent, so every oracle stays
hash-exact; these tests fail loudly if either engine changes behavior
(a silent convergence would mean the caveats can be removed, a new
divergence that the guards below don't expect would mean a new class).
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def _spark_one(spark, expr_builder, value):
    df = spark.createDataFrame([(value,)], "t string")
    return df.select(expr_builder(F.col("t")).alias("o")).first()["o"]


def _duck_one(duck, sql_expr, value):
    duck.register("ce_t", pd.DataFrame({"t": [value]}))
    return duck.sql(f"SELECT {sql_expr} FROM ce_t").fetchone()[0]


def test_word_boundary_divergence_pinned(spark, duck):
    """<div世界> matches RE2's <div\\b[^>]*> but not Java's -- the
    finding that drove html.py's \\b-free tag patterns."""
    pat = r"<div\b[^>]*>"
    val = "<div世界>x"
    spark_hit = _spark_one(
        spark, lambda c: F.regexp_replace(c, pat, "_"), val
    )
    duck_hit = _duck_one(duck, f"regexp_replace(t, '{pat}', '_', 'g')", val)
    assert spark_hit == val  # Java: 世 is a word char -> no boundary
    assert duck_hit == "_x"  # RE2: ASCII \b -> boundary -> match


def test_whitespace_class_divergence_pinned(spark, duck):
    r"""\x0B (vertical tab) is \s in Java, not in RE2."""
    val = "a\x0bb"
    spark_split = _spark_one(spark, lambda c: F.split(c, r"\s+"), val)
    duck_split = _duck_one(duck, "regexp_split_to_array(t, '\\s+')", val)
    assert spark_split == ["a", "b"]
    assert duck_split == ["a\x0bb"]


def test_lower_divergence_pinned(spark, duck):
    """Turkish İ and Greek final sigma lowercase differently (Java full
    mapping vs utf8proc simple mapping)."""
    assert _spark_one(spark, F.lower, "İ") == "i̇"
    assert _duck_one(duck, "lower(t)", "İ") == "i"
    assert _spark_one(spark, F.lower, "ΟΔΟΣ") == "οδος"  # final ς
    assert _duck_one(duck, "lower(t)", "ΟΔΟΣ") == "οδοσ"  # plain σ


def test_safe_subset_is_exact(spark, duck):
    """The constructs the oracles DO rely on -- ASCII lower, \\s+ word
    split without \\x0B, trim, md5, explicit character classes, lazy
    quantifiers, inline (?is) -- agree exactly over a mixed
    ASCII/CJK/emoji/quote corpus."""
    vals = [
        "The QUICK brown\tfox. ",
        "  mixed 世界 words λ plus café  ",
        "ümlauts ÉÀ über straße",
        "emoji 🙂 and “curly ‘quotes’”",
        "tabs\t\tand\nnewlines\r\n",
        "",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    got = [
        (r["w"], r["h"])
        for r in df.select(
            F.split(F.trim(F.lower("t")), r"\s+").alias("w"),
            F.md5(F.regexp_replace(F.trim(F.lower("t")), r"\s+", " ")).alias(
                "h"
            ),
        ).collect()
    ]
    duck.register("ce_vals", pd.DataFrame({"t": vals}))
    want = duck.sql(
        "SELECT regexp_split_to_array(trim(lower(t)), '\\s+'),"
        " md5(regexp_replace(trim(lower(t)), '\\s+', ' ', 'g')) FROM ce_vals"
    ).fetchall()
    assert got == [tuple(w) for w in want]
