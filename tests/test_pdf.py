"""PDF heuristic tests using the reference's hand-crafted fixture
byte-for-byte (src/pdf.rs:83-92) plus the heuristic boundary cases.
"""

import pytest

from letsearch_spark.sources.pdf import (
    _check_text_pdf,
    is_text_pdf,
    pdf_to_markdown,
)

# reference fixture, pdf.rs:88 (50 non-whitespace chars, single page)
PDF_BYTES = (
    b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n2 0 obj\n"
    b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n3 0 obj\n"
    b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]\n"
    b"  /Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n"
    b"4 0 obj\n<< /Length 82 >>\nstream\nBT /F1 12 Tf 50 700 Td "
    b"(AAAAAAAAAABBBBBBBBBBCCCCCCCCCCDDDDDDDDDDEEEEEEEEEE) Tj ET\nendstream\nendobj\n"
    b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n"
    b"xref\n0 6\n0000000000 65535 f \n0000000009 00000 n \n0000000058 00000 n \n"
    b"0000000115 00000 n \n0000000243 00000 n \n0000000374 00000 n \ntrailer\n"
    b"<< /Size 6 /Root 1 0 R >>\nstartxref\n444\n%%EOF\n"
)


@pytest.fixture
def text_pdf(tmp_path):
    p = tmp_path / "letsearch_test_text.pdf"
    p.write_bytes(PDF_BYTES)
    return str(p)


def test_is_text_pdf_with_text_doc(text_pdf):  # pdf.rs:94-110
    assert is_text_pdf(text_pdf) is True


def test_pdf_to_markdown_succeeds_on_text_pdf(text_pdf):  # pdf.rs:112-123
    md = pdf_to_markdown(text_pdf)
    assert "AAAAAAAAAA" in md


def test_is_text_pdf_missing_file():  # pdf.rs:125-129
    with pytest.raises(OSError):
        is_text_pdf("/nonexistent/path/file.pdf")


def test_heuristic_boundaries():
    # page with exactly 50 non-ws chars -> text (>= MIN_CHARS_PER_PAGE)
    assert _check_text_pdf(["x" * 50]) is True
    assert _check_text_pdf(["x" * 49]) is False
    assert _check_text_pdf([]) is False
    # 4 pages, sqrt sampling: sample_count=2, step=2 -> pages 0 and 2
    assert _check_text_pdf(["x" * 50, "", "x" * 50, ""]) is True
    assert _check_text_pdf(["", "x" * 50, "", "x" * 50]) is False
    # ratio boundary: 1 of 2 sampled pages texty -> 0.5 >= 0.5 -> True
    assert _check_text_pdf(["x" * 50, "", "", ""]) is True
