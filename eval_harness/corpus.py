"""Evaluation corpus materialization: PDFs + ground-truth JSONL.

The corpus content lives in corpus_data.py (18 authored manual-style
documents, 45 retrieval + 5 rejection queries — see its module docstring
for the hardness design). This module renders the documents as real
multi-page PDFs (so the evaluation exercises the full ingest pipeline:
extraction, chunking, page tracking) and writes the reference-format
ground truth (queries.jsonl schema from
/root/reference/docs/RAG_EVALUATION_FRAMEWORK_SPEC.md:115-205).

passage_hashes() exposes normalized content hashes of every passage so the
encoder training pipeline can hold eval text out of its corpus
(training/corpus.harvest exclude_hashes) — with authored passages this is
belt-and-braces, but it keeps the no-memorization property enforced rather
than assumed.
"""

from __future__ import annotations

import json
import os
import textwrap
import zlib
from typing import List, Set

from eval_harness.corpus_data import DOCS, QUERIES, REJECTION_QUERIES

_WRAP_WIDTH = 78


def _ascii(s: str) -> str:
    """PDF content streams here are latin-1; transliterate the few
    non-latin typographic characters the authored text uses."""
    s = (
        s.replace("—", "--")
        .replace("–", "-")
        .replace("‘", "'")
        .replace("’", "'")
        .replace("“", '"')
        .replace("”", '"')
    )
    # harvested distractor prose may carry arbitrary unicode; anything
    # beyond latin-1 degrades to '?' in the rendered PDF (content only —
    # never used for gold matching)
    return s.encode("latin-1", "replace").decode("latin-1")


def _wrap_page(text: str) -> str:
    lines: List[str] = []
    for para in text.split("\n"):
        wrapped = textwrap.wrap(para, _WRAP_WIDTH) or [""]
        lines.extend(wrapped)
    return "\n".join(lines)


def _make_pdf(pages: List[str]) -> bytes:
    """Minimal multi-page PDF writer (text via Tj operators)."""
    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    objects: List[bytes] = []

    def add(obj: bytes) -> int:
        objects.append(obj)
        return len(objects)

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    contents = []
    for page in pages:
        ops = ["BT", "/F1 12 Tf", "72 720 Td"]
        for i, ln in enumerate(page.split("\n")):
            if i:
                ops.append("0 -16 Td")
            ops.append(f"({esc(ln)}) Tj")
        ops.append("ET")
        stream = "\n".join(ops).encode("latin-1")
        comp = zlib.compress(stream)
        contents.append(
            add(
                b"<< /Length " + str(len(comp)).encode()
                + b" /Filter /FlateDecode >>\nstream\n" + comp + b"\nendstream"
            )
        )
    pages_obj = len(objects) + len(pages) + 1
    page_nums = [
        add(
            (
                f"<< /Type /Page /Parent {pages_obj} 0 R /MediaBox "
                f"[0 0 612 792] /Resources << /Font << /F1 {font} 0 R >> >> "
                f"/Contents {c} 0 R >>"
            ).encode()
        )
        for c in contents
    ]
    kids = " ".join(f"{p} 0 R" for p in page_nums)
    pn = add(f"<< /Type /Pages /Kids [{kids}] /Count {len(page_nums)} >>".encode())
    assert pn == pages_obj
    cat = add(f"<< /Type /Catalog /Pages {pn} 0 R >>".encode())

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, obj in enumerate(objects, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref = len(out)
    out += f"xref\n0 {len(objects)+1}\n".encode() + b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects)+1} /Root {cat} 0 R >>\n"
        f"startxref\n{xref}\n%%EOF\n"
    ).encode()
    return bytes(out)


_DISTRACTORS_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "distractors.jsonl"
)


def load_distractors() -> List[dict]:
    """The committed distractor documents: 45 x 8 pages of real harvested
    documentation prose (no gold references point at them). They exist to
    make the corpus large enough that top-5 of N is a real test — without
    them 5 results over ~54 authored chunks lets even weak lexical signals
    'hit' (observed: BM25-only scored 0.889 on the authored docs alone)."""
    if not os.path.exists(_DISTRACTORS_PATH):
        return []
    out = []
    with open(_DISTRACTORS_PATH, encoding="utf-8") as f:
        for line in f:
            if line.strip():
                out.append(json.loads(line))
    return out


def passage_hashes() -> Set[str]:
    """Normalized content hashes of every eval passage — authored AND
    distractor — for the training holdout."""
    from rust_local_rag_tpu.training.corpus import normalized_hash

    out: Set[str] = set()
    for doc in DOCS:
        for page in doc["pages"]:
            body = _ascii(page)
            out.add(normalized_hash(body))
            # also hash the body without its heading line, the form a
            # harvested paragraph would most plausibly take
            parts = body.split("\n", 1)
            if len(parts) == 2:
                out.add(normalized_hash(parts[1]))
    for doc in load_distractors():
        for page in doc["pages"]:
            out.add(normalized_hash(page))
            for para in page.split("\n\n"):
                out.add(normalized_hash(para))
    # third-party eval documents too (belt-and-braces: their sources —
    # pydoc topics, pygame docs — are not in training/corpus.py's package
    # list, but the holdout is enforced rather than assumed)
    try:
        from eval_harness.thirdparty import thirdparty_docs

        for doc in thirdparty_docs():
            for page in doc["pages"]:
                out.add(normalized_hash(page))
                for para in page.split("\n\n"):
                    out.add(normalized_hash(para))
    except Exception:  # noqa: BLE001 — sources absent on some hosts
        pass
    return out


def generate_corpus(
    documents_dir: str, with_distractors: bool = True
) -> List[str]:
    """Write the evaluation PDFs; returns document names."""
    os.makedirs(documents_dir, exist_ok=True)
    names = []
    topics: List[dict] = list(DOCS)
    if with_distractors:
        topics = topics + load_distractors()
    for topic in topics:
        path = os.path.join(documents_dir, topic["doc"])
        pages = [_wrap_page(_ascii(p)) for p in topic["pages"]]
        with open(path, "wb") as f:
            f.write(_make_pdf(pages))
        names.append(topic["doc"])
    return names


def generate_ground_truth(path: str, split: str = "dev") -> int:
    """Write the JSONL ground truth; returns query count.

    split="dev" is the original 50-query set (used by sweeps and adoption
    decisions); split="test" is the held-out report-only set authored in
    heldout_data.py — never consulted for tuning (its docstring records
    the hygiene contract).
    """
    if split == "dev":
        queries, rejections, prefix, notes = (
            QUERIES, REJECTION_QUERIES, "Q", "authored eval corpus v2"
        )
    elif split == "test":
        from eval_harness.heldout_data import (
            HELDOUT_QUERIES,
            HELDOUT_REJECTION_QUERIES,
        )

        queries, rejections, prefix, notes = (
            HELDOUT_QUERIES,
            HELDOUT_REJECTION_QUERIES,
            "H",
            "authored eval corpus v2 heldout",
        )
    else:
        raise ValueError(f"unknown split {split!r}")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cat = {d["doc"]: d["category"] for d in DOCS}
    rows = []
    for qn, (query, doc, page, difficulty, gist) in enumerate(queries, 1):
        rows.append(
            {
                "query_id": f"{prefix}{qn:03d}",
                "query": query,
                "category": cat[doc],
                "difficulty": difficulty,
                "is_rejection": False,
                "gold_references": [
                    {"document": doc, "page": page, "relevance": 3}
                ],
                "expected_answer_gist": gist,
                "notes": notes,
            }
        )
    for i, query in enumerate(rejections):
        rows.append(
            {
                "query_id": f"{prefix}{len(queries) + i + 1:03d}",
                "query": query,
                "category": "rejection",
                "difficulty": "hard",
                "is_rejection": True,
                "gold_references": [],
                "expected_answer_gist": "no relevant content exists",
                "notes": notes,
            }
        )
    with open(path, "w", encoding="utf-8") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    return len(rows)
