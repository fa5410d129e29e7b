"""Chat/SFT templating: conversations -> training text + loss-mask
spans.

Instruction-tuning pipelines store conversations as arrays of
(role, content) turns and need two things at egress: the RENDERED
training string under a chat template, and the character spans of the
assistant turns -- the only tokens the loss should see (prompt masking;
the span ends later convert to token offsets after tokenization).

Both come out of ONE pure-Catalyst projection (``transform`` renders
each turn, one ``aggregate`` computes the prefix lengths, ``zip_with``
+ ``filter`` slice out the assistant spans) -- map-only, zero shuffles,
zero UDFs, so the rewrite is free at any corpus size and the span
arithmetic is engine-exact (a DuckDB oracle replays it to the
character).

Templates (the two public fixed-token shapes):

* ``'chatml'``: ``<|im_start|>{role}\\n{content}<|im_end|>\\n`` per
  turn (the ChatML framing used by many open instruct models);
* ``'plain'``: ``### {role}:\\n{content}\\n\\n`` (the classic
  Alpaca-style layout).

Spans cover the CONTENT of assistant turns only (template markers and
role headers stay masked). Null contents render as ''.

No reference analog (SURVEY.md §2.7 north-star family); the prompt-
masking convention follows public SFT practice (e.g. the Alpaca /
FastChat training scripts).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TEMPLATES = {
    "chatml": ("<|im_start|>", "\n", "<|im_end|>\n"),
    "plain": ("### ", ":\n", "\n\n"),
}


def render_chat(msgs: Column, template: str = "chatml") -> Column:
    """Render an ``array<struct<role string, content string>>`` column:
    returns ``struct(text string, spans array<struct<start long,
    end long>>)`` where text is the templated conversation and spans
    are the 0-based [start, end) character ranges of each ASSISTANT
    turn's content inside text -- the unmasked regions for SFT loss.

    ``text[start:end] == content`` exactly (pinned by tests); role
    markers never enter a span. Pure Catalyst: one transform for the
    pieces, one aggregate for the running offsets, zip_with + filter
    for the spans.
    """
    if template not in _TEMPLATES:
        raise ValueError(
            f"template must be one of {sorted(_TEMPLATES)}, got {template!r}"
        )
    pre, mid, post = _TEMPLATES[template]

    def piece(m):
        # null roles/contents (malformed turns, e.g. from_json misses)
        # render as '' -- a NULL piece would silently DESYNC text and
        # spans (array_join drops NULLs, the offset aggregate doesn't)
        return F.concat(
            F.lit(pre),
            F.coalesce(m["role"], F.lit("")),
            F.lit(mid),
            F.coalesce(m["content"], F.lit("")),
            F.lit(post),
        )

    pieces = F.transform(msgs, piece)
    text = F.array_join(pieces, "")
    # running start offset of each piece: aggregate builds [0, l0,
    # l0+l1, ...] (one extra trailing element, ignored by zip_with)
    starts = F.aggregate(
        pieces,
        F.array(F.lit(0).cast("long")),
        lambda acc, p: F.concat(
            acc,
            F.array(F.element_at(acc, -1) + F.length(p)),
        ),
    )
    spans = F.filter(
        F.zip_with(
            msgs,
            F.slice(starts, 1, F.size(msgs)),
            lambda m, s: F.struct(
                F.coalesce(m["role"], F.lit("")).alias("_role"),
                (
                    s
                    + F.length(F.lit(pre))
                    + F.length(F.coalesce(m["role"], F.lit("")))
                    + F.length(F.lit(mid))
                ).alias("start"),
                (
                    s
                    + F.length(F.lit(pre))
                    + F.length(F.coalesce(m["role"], F.lit("")))
                    + F.length(F.lit(mid))
                    + F.length(F.coalesce(m["content"], F.lit("")))
                ).alias("end"),
            ),
        ),
        # case-insensitive role match (ADVICE r8): 'Assistant'/
        # 'ASSISTANT' turns must unmask too -- a case-sensitive compare
        # would silently mask the whole conversation (zero loss spans)
        lambda sp: F.lower(sp["_role"]) == "assistant",
    )
    spans = F.transform(
        spans, lambda sp: F.struct(sp["start"].alias("start"), sp["end"].alias("end"))
    )
    return F.struct(text.alias("text"), spans.alias("spans"))
