"""Unit tests for the PDF layout-extraction kernel (pure Python)."""

from document_ai_spark.kernel.extract import extract_document
from document_ai_spark.kernel.pdf_extract import extract_pdf, is_pdf


def pdf(*objs: str) -> bytes:
    return ("%PDF-1.4\nstream\n" + "\n".join(objs) + "\nendstream\n%%EOF\n").encode()


def obj(x: int, y: int, text: str, size: int = 12) -> str:
    return f"BT /F1 {size} Tf {x} {y} Td ({text}) Tj ET"


def test_magic_dispatch():
    assert is_pdf(b"%PDF-1.4")
    assert not is_pdf(b"<html>")
    assert extract_document(pdf(obj(72, 700, "hello")))[1] == "pdf"


def test_two_column_reading_order():
    # right-column line is ABOVE left-column lines in y, but reading order
    # must finish the left column first (columns left-to-right).
    payload = pdf(
        obj(320, 720, "right col first line"),
        obj(72, 700, "left col second line"),
        obj(72, 714, "left col first line"),
        obj(320, 706, "right col second line"),
    )
    text, spans = extract_pdf(payload)
    assert text.index("left col first") < text.index("left col second") < text.index("right col first") < text.index("right col second")
    assert [s["tag"] for s in spans] == ["pdf:c0r0", "pdf:c1r0"]


def test_header_footer_bands_dropped():
    payload = pdf(
        obj(72, 760, "Running Header", 10),
        obj(72, 40, "page 3", 8),
        obj(72, 700, "body line stays"),
    )
    text, _ = extract_pdf(payload)
    assert text == "body line stays"


def test_paragraph_gap_splits_regions():
    payload = pdf(
        obj(72, 700, "para one line one"),
        obj(72, 686, "para one line two"),
        obj(72, 600, "para two after big gap"),
    )
    text, spans = extract_pdf(payload)
    assert text == "para one line one para one line two\n\npara two after big gap"
    assert len(spans) == 2


def test_document_order_irrelevant():
    a = pdf(obj(72, 700, "first"), obj(72, 686, "second"))
    b = pdf(obj(72, 686, "second"), obj(72, 700, "first"))
    assert extract_pdf(a)[0] == extract_pdf(b)[0] == "first second"


def test_zero_text_objects_is_empty():
    doc_hash, kind, text, spans, n, nb, err = extract_document(b"%PDF-1.4\n%%EOF\n")
    assert kind == "empty" and text == "" and err is None


def test_span_offsets_reconstruct():
    payload = pdf(obj(72, 700, "alpha"), obj(72, 600, "beta"), obj(320, 700, "gamma"))
    text, spans = extract_pdf(payload)
    for s in spans:
        assert text[s["char_start"] : s["char_end"]] in ("alpha", "beta", "gamma")
