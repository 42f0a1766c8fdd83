"""Minimal PDF writer for tests: multi-page text PDFs with optional
FlateDecode compression. Independent of the extractor implementation."""

from __future__ import annotations

import zlib
from typing import List, Sequence


def _escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def make_pdf(pages: Sequence[str], compress: bool = False) -> bytes:
    """Build a PDF where each entry of `pages` becomes one page; paragraphs
    (split on blank lines) become separate text lines via Td moves."""
    objects: List[bytes] = []

    def add(obj: bytes) -> int:
        objects.append(obj)
        return len(objects)  # 1-based object number

    font_num = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    content_nums = []
    for page_text in pages:
        lines = page_text.split("\n")
        ops = ["BT", "/F1 12 Tf", "72 720 Td"]
        first = True
        for ln in lines:
            if not first:
                ops.append("0 -16 Td")
            ops.append(f"({_escape(ln)}) Tj")
            first = False
        ops.append("ET")
        stream = "\n".join(ops).encode("latin-1")
        if compress:
            comp = zlib.compress(stream)
            obj = (
                b"<< /Length " + str(len(comp)).encode() + b" /Filter /FlateDecode >>\nstream\n"
                + comp + b"\nendstream"
            )
        else:
            obj = (
                b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n"
                + stream + b"\nendstream"
            )
        content_nums.append(add(obj))

    page_nums = []
    pages_num_placeholder = len(objects) + len(pages) + 1  # filled later
    for cn in content_nums:
        page_nums.append(
            add(
                (
                    "<< /Type /Page /Parent {pp} 0 R /MediaBox [0 0 612 792] "
                    "/Resources << /Font << /F1 {f} 0 R >> >> /Contents {c} 0 R >>"
                ).format(pp=pages_num_placeholder, f=font_num, c=cn).encode()
            )
        )

    kids = " ".join(f"{p} 0 R" for p in page_nums)
    pages_num = add(
        f"<< /Type /Pages /Kids [{kids}] /Count {len(page_nums)} >>".encode()
    )
    assert pages_num == pages_num_placeholder
    catalog_num = add(f"<< /Type /Catalog /Pages {pages_num} 0 R >>".encode())

    # serialize with xref
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, obj in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects)+1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects)+1} /Root {catalog_num} 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)
