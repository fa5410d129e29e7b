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

Markdown conversion (the pdf_oxide analog, pdf.rs:62-73): the builtin
extractor tracks the active font size (``Tf`` operators) per text run,
and :func:`runs_to_markdown` promotes short runs set significantly
larger than the body size to ``#``/``##``/``###`` ATX headings --
structure the hierarchical chunker (T1) keys on. The pypdf backend
yields plain text runs (size-less), which degrade to paragraphs.

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


_OP_RE = re.compile(
    rb"(?:/\w+\s+(?P<size>\d+(?:\.\d+)?)\s+Tf)"
    rb"|(?:\((?P<s>(?:\\.|[^\\()])*)\)\s*Tj)"
)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")


def _unescape_pdf_string(raw: bytes) -> str:
    out = raw.replace(rb"\(", b"(").replace(rb"\)", b")").replace(rb"\\", b"\\")
    return out.decode("latin-1", errors="replace")


def _extract_runs_builtin(data: bytes) -> list[list[tuple[str, float]]]:
    """Last-resort extractor for simple, uncompressed PDFs (e.g. the
    reference's test fixture). One entry per /Type /Page object; each
    page is a list of (text, font_size) runs -- every ``(...) Tj``
    show-text operand tagged with the active ``Tf`` size (0.0 when no
    Tf precedes it). This is NOT a general PDF parser -- real corpora
    should have pypdf.
    """
    n_pages = len(_PAGE_RE.findall(data))
    if n_pages == 0:
        raise ValueError("not a parseable PDF (no /Type /Page objects)")
    streams: list[list[tuple[str, float]]] = []
    for m in _STREAM_RE.finditer(data):
        runs: list[tuple[str, float]] = []
        size = 0.0
        for op in _OP_RE.finditer(m.group(1)):
            if op.group("size") is not None:
                size = float(op.group("size"))
            else:
                runs.append((_unescape_pdf_string(op.group("s")), size))
        if runs:
            streams.append(runs)
    # associate streams to pages positionally; missing -> empty page
    pages: list[list[tuple[str, float]]] = [[] for _ in range(n_pages)]
    for i, r in enumerate(streams[:n_pages]):
        pages[i] = r
    return pages


def extract_runs(data: bytes) -> list[list[tuple[str, float]]]:
    """(text, font_size) runs per page; pypdf text degrades to one
    size-less run per page (size 0.0 == body)."""
    plain = _extract_pages_pypdf(data)
    if plain is not None:
        return [[(p, 0.0)] if p else [] for p in plain]
    return _extract_runs_builtin(data)


def extract_pages(data: bytes) -> list[str]:
    return [" ".join(t for t, _ in runs) for runs in extract_runs(data)]


def runs_to_markdown(pages: list[list[tuple[str, float]]]) -> str:
    """Markdown with ATX headings from font-size structure (the
    pdf_oxide-converter analog, pdf.rs:62-73).

    Body size = the size carrying the most text; a short run set at
    >= 1.15x body becomes a heading, level by rank of its size among
    heading sizes (largest -> #, then ##, ###; deeper sizes clamp to
    ###, the deepest level the hierarchical chunker splits on).
    """
    from collections import Counter

    weight: Counter = Counter()
    for runs in pages:
        for text, size in runs:
            if text.strip():
                weight[size] += len(text)
    if not weight:
        return ""
    body_size = max(weight.items(), key=lambda kv: (kv[1], kv[0]))[0]
    heading_sizes = sorted(
        {
            s
            for runs in pages
            for t, s in runs
            if t.strip() and s >= body_size * 1.15 and len(t.strip()) <= 100
        },
        reverse=True,
    )
    level = {s: min(i + 1, 3) for i, s in enumerate(heading_sizes)}

    out_pages: list[str] = []
    for runs in pages:
        blocks: list[str] = []
        para: list[str] = []
        for text, size in runs:
            t = text.strip()
            if not t:
                continue
            if size in level and len(t) <= 100:
                if para:
                    blocks.append(" ".join(para))
                    para = []
                blocks.append(f"{'#' * level[size]} {t}")
            else:
                para.append(t)
        if para:
            blocks.append(" ".join(para))
        if blocks:
            out_pages.append("\n\n".join(blocks))
    return "\n\n".join(out_pages)


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


def _data_to_markdown(data: bytes) -> str:
    """Shared conversion core: heuristic on plain text, markdown (with
    font-size headings) from the same runs."""
    runs = extract_runs(data)
    plain = [" ".join(t for t, _ in page) for page in runs]
    if not _check_text_pdf(plain):
        raise ValueError(
            "PDF appears to be a scanned document without extractable text"
        )
    return runs_to_markdown(runs)


def pdf_to_markdown(path: str) -> str:
    """pdf.rs:62-73 -- single open; heuristic + conversion on the same doc."""
    with open(path, "rb") as f:
        data = f.read()
    try:
        return _data_to_markdown(data)
    except ValueError as e:
        raise ValueError(f"{path!r}: {e}") from e


def synthesize_pdf(pages: list[list[tuple[str, float]]]) -> bytes:
    """Build a minimal uncompressed PDF in the exact shape of the
    reference's hand-crafted test fixture (pdf.rs:83-92): one catalog,
    one /Pages tree, one /Type /Page + content stream per page, text as
    ``/F1 <size> Tf (<text>) Tj`` runs. There is no PDF in the driver's
    testdata, so the contract query synthesizes its own inputs with
    this; it emits only constructs the builtin extractor (and any real
    PDF reader) understands."""
    out = [b"%PDF-1.4\n"]
    objs: list[bytes] = []
    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    font_obj = 3 + 2 * n_pages
    for i, runs in enumerate(pages):
        page_no, content_no = 3 + 2 * i, 4 + 2 * i
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {content_no} 0 R "
                f"/Resources << /Font << /F1 {font_obj} 0 R >> >> >>"
            ).encode()
        )
        parts = [b"BT"]
        for text, size in runs:
            esc = (
                text.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
            )
            parts.append(
                f"/F1 {size:g} Tf ({esc}) Tj".encode("latin-1", errors="replace")
            )
        parts.append(b"ET")
        stream = b" ".join(parts)
        objs.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i, body in enumerate(objs):
        out.append(b"%d 0 obj\n%s\nendobj\n" % (i + 1, body))
    out.append(b"trailer\n<< /Size %d /Root 1 0 R >>\n%%%%EOF\n" % (len(objs) + 1))
    return b"".join(out)


def pdf_fixture_files() -> dict[str, bytes]:
    """Deterministic synthetic PDF corpus for the `pdf_ingest` contract
    query: the reference fixture's plain one-pager (pdf.rs:88), a
    font-size-structured report (headings for the T1 chunker), a
    multi-page doc exercising the sqrt page-sampling heuristic
    (pdf.rs:19-41), a sparse 'scanned' doc the heuristic must reject,
    and a non-PDF byte blob the parser must survive."""
    body = 12.0
    plain = [[("AAAAAAAAAABBBBBBBBBBCCCCCCCCCCDDDDDDDDDDEEEEEEEEEE", body)]]
    structured = [
        [
            ("Quarterly Report", 24.0),
            (
                "This report summarizes the quarter with revenue growth "
                "and cost detail across all operating segments worldwide",
                body,
            ),
            ("Revenue Overview", 18.0),
            (
                "Revenue grew nine percent on strong subscription demand "
                "and better renewal rates in every region we serve today",
                body,
            ),
            ("Cost Analysis", 18.0),
            (
                "Costs fell as cloud migration completed and vendor "
                "consolidation reduced our total infrastructure footprint",
                body,
            ),
        ]
    ]
    multi = [
        [
            (f"Chapter {i}", 20.0),
            (
                f"Page {i} of the handbook explains procedure number {i} "
                "in enough words to clear the fifty character floor easily",
                body,
            ),
        ]
        for i in range(1, 10)
    ]
    scanned = [[("tiny", body)] for _ in range(4)]
    return {
        "plain.pdf": synthesize_pdf(plain),
        "structured.pdf": synthesize_pdf(structured),
        "multi.pdf": synthesize_pdf(multi),
        "scanned.pdf": synthesize_pdf(scanned),
        "garbage.pdf": b"not a pdf at all",
    }


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
                    text = _data_to_markdown(bytes(content))
                    ok = True
                except Exception:
                    ok, text = False, None
                rows.append((p, text, ok))
            yield pd.DataFrame(rows, columns=["path", column, "is_text"])

    binary = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    return binary.mapInPandas(parse, schema=schema)
