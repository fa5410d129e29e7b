"""Chat/SFT templating (functions/chat.py): rendered text, exact
assistant-content spans, both templates, nulls, plan shape."""

import pytest
from pyspark.sql import functions as F

from letsearch_spark.functions.chat import render_chat


def _chats(spark):
    rows = [
        (
            1,
            [
                ("system", "be concise"),
                ("user", "what is spark?"),
                ("assistant", "a distributed engine"),
                ("user", "and catalyst?"),
                ("assistant", "its optimizer"),
            ],
        ),
        (2, [("user", "hi"), ("assistant", "")]),  # empty assistant
        (3, [("user", "lone prompt")]),  # no assistant at all
        (4, [("user", "q"), ("assistant", None)]),  # null content
        (5, [("assistant", "unicode 中文 \U0001f600 ok")]),
        # review catch r8: a NULL role must not desync text and spans
        # (a NULL piece would vanish from array_join while the offset
        # aggregate kept counting it)
        (6, [(None, "orphan"), ("assistant", "after the orphan")]),
    ]
    return spark.createDataFrame(
        rows,
        "id long, msgs array<struct<role string, content string>>",
    )


@pytest.mark.parametrize("template", ["chatml", "plain"])
def test_render_chat_spans_slice_content(spark, template):
    """The contract that matters for loss masking: text[start:end] is
    EXACTLY the assistant turn's content, for every assistant turn,
    under both templates; non-assistant turns never produce spans."""
    df = _chats(spark).select(
        "id", "msgs", render_chat(F.col("msgs"), template).alias("r")
    )
    for row in df.collect():
        text, spans = row["r"]["text"], row["r"]["spans"]
        contents = [
            (m["content"] or "")
            for m in row["msgs"]
            if m["role"] == "assistant"
        ]
        assert len(spans) == len(contents)
        for sp, want in zip(spans, contents):
            assert text[sp["start"] : sp["end"]] == want
        # every turn's content appears in the text (null -> '')
        for m in row["msgs"]:
            assert (m["content"] or "") in text


def test_render_chat_chatml_layout(spark):
    df = spark.createDataFrame(
        [(1, [("user", "hi"), ("assistant", "yo")])],
        "id long, msgs array<struct<role string, content string>>",
    )
    r = df.select(render_chat(F.col("msgs")).alias("r")).first()["r"]
    assert r["text"] == (
        "<|im_start|>user\nhi<|im_end|>\n"
        "<|im_start|>assistant\nyo<|im_end|>\n"
    )
    # piece 0 is 30 chars; '<|im_start|>assistant\n' is 22 more
    assert [tuple(s) for s in r["spans"]] == [(52, 54)]

    with pytest.raises(ValueError, match="template"):
        render_chat(F.col("msgs"), "nope")


def test_render_chat_is_scan_only(spark):
    """Map-only: no Exchange, no Python eval — the rewrite is free at
    corpus scale."""
    df = _chats(spark).select(render_chat(F.col("msgs")).alias("r"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_render_chat_role_case_insensitive(spark):
    """ADVICE r8: 'Assistant'/'ASSISTANT' turns unmask exactly like
    'assistant' -- the rendered text keeps the original casing, only
    the span filter compares case-insensitively."""
    df = spark.createDataFrame(
        [
            (1, [("user", "q"), ("Assistant", "Aa"), ("ASSISTANT", "Bb")]),
        ],
        "id long, msgs array<struct<role string, content string>>",
    )
    r = df.select(render_chat(F.col("msgs")).alias("r")).first()["r"]
    text, spans = r["text"], r["spans"]
    assert "<|im_start|>Assistant\n" in text  # casing preserved
    assert [text[sp["start"] : sp["end"]] for sp in spans] == ["Aa", "Bb"]
