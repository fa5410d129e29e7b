"""PDF source (S5): text-PDF heuristic + PDF -> Markdown conversion.

Reference: src/pdf.rs. The *heuristic* is reproduced exactly
(pdf.rs:19-41): sample ``ceil(sqrt(pages))`` evenly spaced pages with
``step = max(pages // samples, 1)``; a page is text-bearing when it has
>= MIN_CHARS_PER_PAGE (50) non-whitespace chars; the document is a text
PDF when >= MIN_TEXT_PAGE_RATIO (0.5) of sampled pages are.

This container has no PDF library, so *page text extraction* has two
backends:
* ``pypdf`` when importable (real extraction);
* a minimal built-in extractor for simple uncompressed PDFs that pulls
  ``(text) Tj`` show-text operands out of content streams -- enough for
  the reference's own hand-crafted test fixture (pdf.rs:83-92) and for
  exercising the heuristic end-to-end without native deps.

Markdown conversion beyond plain text concatenation (headings, lists)
is deliberately out of scope, like the reference delegating to
pdf_oxide's converter: we emit one markdown paragraph per page.

Distributed use: ``spark.read.format("binaryFile")`` over a directory of
PDFs + ``mapInPandas`` applying these functions per file (see
:func:`read_pdfs`); each executor parses its own files, the driver never
touches PDF bytes.
"""

from __future__ import annotations

import math
import re

MIN_CHARS_PER_PAGE = 50  # pdf.rs:11
MIN_TEXT_PAGE_RATIO = 0.5  # pdf.rs:15


def _extract_pages_pypdf(data: bytes) -> list[str] | None:
    try:
        from io import BytesIO

        from pypdf import PdfReader  # optional
    except ImportError:
        return None
    reader = PdfReader(BytesIO(data))
    return [(p.extract_text() or "") for p in reader.pages]


_TJ_RE = re.compile(rb"\((?P<s>(?:\\.|[^\\()])*)\)\s*Tj")
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")


def _unescape_pdf_string(raw: bytes) -> str:
    out = raw.replace(rb"\(", b"(").replace(rb"\)", b")").replace(rb"\\", b"\\")
    return out.decode("latin-1", errors="replace")


def _extract_pages_builtin(data: bytes) -> list[str]:
    """Last-resort extractor for simple, uncompressed PDFs (e.g. the
    reference's test fixture). One entry per /Type /Page object; all text
    shown via ``(...) Tj`` in content streams is concatenated in order.
    This is NOT a general PDF parser -- real corpora should have pypdf.
    """
    n_pages = len(_PAGE_RE.findall(data))
    if n_pages == 0:
        raise ValueError("not a parseable PDF (no /Type /Page objects)")
    texts = []
    for m in _STREAM_RE.finditer(data):
        parts = [_unescape_pdf_string(t.group("s")) for t in _TJ_RE.finditer(m.group(1))]
        if parts:
            texts.append(" ".join(parts))
    # associate streams to pages positionally; missing -> empty page
    pages = [""] * n_pages
    for i, t in enumerate(texts[:n_pages]):
        pages[i] = t
    return pages


def extract_pages(data: bytes) -> list[str]:
    pages = _extract_pages_pypdf(data)
    if pages is None:
        pages = _extract_pages_builtin(data)
    return pages


def _check_text_pdf(pages: list[str]) -> bool:
    """Exact port of check_text_pdf (pdf.rs:19-41)."""
    total_pages = len(pages)
    if total_pages == 0:
        return False
    sample_count = min(max(math.ceil(math.sqrt(total_pages)), 1), total_pages)
    step = max(total_pages // sample_count, 1)
    text_pages = 0
    for i in range(sample_count):
        page_idx = min(i * step, total_pages - 1)
        non_ws = sum(1 for c in pages[page_idx] if not c.isspace())
        if non_ws >= MIN_CHARS_PER_PAGE:
            text_pages += 1
    return (text_pages / sample_count) >= MIN_TEXT_PAGE_RATIO


def is_text_pdf(path: str) -> bool:
    """pdf.rs:49-52 -- True when the PDF appears text-based."""
    with open(path, "rb") as f:
        return _check_text_pdf(extract_pages(f.read()))


def pdf_to_markdown(path: str) -> str:
    """pdf.rs:62-73 -- single open; heuristic + conversion on the same doc."""
    with open(path, "rb") as f:
        data = f.read()
    pages = extract_pages(data)
    if not _check_text_pdf(pages):
        raise ValueError(
            f"PDF {path!r} appears to be a scanned document without extractable text"
        )
    return "\n\n".join(p for p in pages if p.strip())


def read_pdfs(spark, path_glob: str, column: str = "text"):
    """Distributed PDF ingest: binaryFile scan + per-executor parse.

    Returns (path string, text string, is_text boolean). Scale: binaryFile
    splits by file; parsing is embarrassingly parallel; only extracted
    text (not raw bytes) survives the projection.
    """
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField(column, T.StringType()),
            T.StructField("is_text", T.BooleanType()),
        ]
    )

    def parse(it):
        for pdf in it:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                try:
                    pages = extract_pages(bytes(content))
                    ok = _check_text_pdf(pages)
                    text = "\n\n".join(pg for pg in pages if pg.strip()) if ok else None
                except Exception:
                    ok, text = False, None
                rows.append((p, text, ok))
            yield pd.DataFrame(rows, columns=["path", column, "is_text"])

    binary = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    return binary.mapInPandas(parse, schema=schema)
