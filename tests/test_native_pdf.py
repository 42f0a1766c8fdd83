"""Native C++ PDF extractor (native/pdftext.cpp) parity with the pure-Python
tier-1 extractor — byte-identical output, so chunk boundaries can never
depend on which tier ran. Reference ingest path: rag_engine.rs:949-1090."""

import os
import zlib

import pytest

from rust_local_rag_tpu.ingest import pdf as P

import pdfgen

pytestmark = pytest.mark.skipif(
    P._load_native() is None, reason="native library not built"
)


def both(data: bytes):
    return P._native_extract(data), P._builtin_extract(data)


def assert_parity(data: bytes):
    nat, py = both(data)
    assert nat == py


def test_simple_pages():
    assert_parity(pdfgen.make_pdf(["Hello world.", "Second page."]))


def test_compressed_streams():
    assert_parity(
        pdfgen.make_pdf(["Flate page one.", "Flate page two."], compress=True)
    )


def test_multiline_paragraphs():
    assert_parity(pdfgen.make_pdf([
        "Para one line.\n\nPara two line.\n\nPara three.",
        "Second page with\n\nmore paragraphs.",
    ]))


def _raw_pdf(content: bytes, extra_objs: bytes = b"") -> bytes:
    """Minimal handwritten PDF with one page and a raw content stream."""
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(content)).encode() + b" >>\n"
        b"stream\n" + content + b"\nendstream endobj\n"
        + extra_objs +
        b"trailer << /Root 1 0 R >>\n%%EOF"
    )


def test_escapes_in_literals():
    content = (
        rb"BT (Tab\there) Tj (paren \( close \)) Tj "
        rb"(octal \101\102\103 end) Tj (back\\slash) Tj "
        rb"(newline\nin string) Tj (lone \q escape) Tj ET"
    )
    assert_parity(_raw_pdf(content))


def test_hex_strings():
    content = (
        b"BT <48656C6C6F> Tj "
        b"<FEFF00480069> Tj "          # UTF-16BE with BOM: "Hi"
        b"<00480065006C006C006F> Tj "  # UTF-16BE without BOM
        b"<4 86> Tj "                  # whitespace + odd length (pad 0)
        b"ET"
    )
    assert_parity(_raw_pdf(content))


def test_tj_array_kerning():
    content = (
        b"BT [(Hel) -50 (lo) -300 (world)] TJ ET"
    )
    nat, py = both(_raw_pdf(content))
    assert nat == py
    assert "Hello world" in nat  # gap < -180 becomes a space


def test_quote_operators_and_td():
    content = (
        b"BT (line one) ' (line two) Tj 0 -14 Td (line three) Tj T* "
        b"1.5 2.5 TD (line four) Tj ET"
    )
    assert_parity(_raw_pdf(content))


def test_latin1_high_bytes():
    content = b"BT (caf\xe9 na\xefve \xb5m) Tj ET"
    nat, py = both(_raw_pdf(content))
    assert nat == py
    assert "café" in nat


def test_nested_unescaped_paren_skipped():
    # "(a(b)" cannot match the literal-string token; both extractors skip
    # the byte and resynchronize identically
    content = b"BT (a(b) Tj (clean) Tj ET"
    assert_parity(_raw_pdf(content))


def test_fallback_page_scan_without_catalog():
    pdf = (
        b"3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length 20 >>\nstream\nBT (orphan page) Tj ET\nendstream endobj\n"
    )
    assert_parity(pdf)


def test_duplicate_object_last_wins():
    content_a = b"BT (first version) Tj ET"
    content_b = b"BT (second version) Tj ET"
    pdf = (
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] >> endobj\n"
        b"3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n"
        b"4 0 obj << >>\nstream\n" + content_a + b"\nendstream endobj\n"
        b"4 0 obj << >>\nstream\n" + content_b + b"\nendstream endobj\n"
    )
    nat, py = both(pdf)
    assert nat == py
    assert "second version" in nat


def test_flate_with_padding_and_length():
    raw = b"BT (padded stream) Tj ET"
    comp = zlib.compress(raw) + b"\x00\x00garbage"
    pdf = (
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] >> endobj\n"
        b"3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Filter /FlateDecode /Length "
        + str(len(comp) - 9).encode() + b" >>\nstream\n"
        + comp + b"\nendstream endobj\n"
    )
    assert_parity(pdf)


def test_both_reject_garbage():
    assert P._native_extract(b"not a pdf at all") is None
    with pytest.raises(Exception):
        P._builtin_extract(b"not a pdf at all")


def test_extract_pdf_text_uses_native(monkeypatch):
    pdf = pdfgen.make_pdf(["Tier zero text."])
    called = {}
    orig = P._builtin_extract

    def spy(data):
        called["python"] = True
        return orig(data)

    monkeypatch.setattr(P, "_builtin_extract", spy)
    out = P.extract_pdf_text(pdf)
    assert "Tier zero text." in out
    assert "python" not in called  # native tier short-circuits


def test_env_disables_native(monkeypatch):
    monkeypatch.setenv("RAG_TPU_NATIVE_PDF", "0")
    assert P._native_extract(pdfgen.make_pdf(["x"])) is None


def test_real_corpus_parity():
    from eval_harness.corpus_data import DOCS
    from eval_harness.corpus import _ascii, _make_pdf

    for d in DOCS[:8]:
        assert_parity(_make_pdf([_ascii(p) for p in d["pages"]]))
