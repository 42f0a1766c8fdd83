"""Third-party evaluation corpus: genuinely foreign technical prose run
through the REAL ingest pipeline (VERDICT r2 missing #4: the authored
eval corpus is written by the same hand as its queries; the encoder's
behavior on text nobody here wrote was unmeasured).

Sources (local, redistributable, verified ABSENT from the encoder's
training corpus — training/corpus.py harvests 14 listed packages, none of
which are these):

  * the CPython reference manual topics bundled with every Python
    install (`pydoc_data.topics`, PSF license) — multi-author standards
    prose;
  * pygame's bundled API reference pages
    (site-packages/pygame/docs/generated/_sources/ref/*.rst.txt,
    LGPL docs) — third-party API-manual prose.

The builder is deterministic: topics/files are selected by NAME, cleaned
of markup, and paginated into fixed ~1100-character pages, so the
hand-authored ground truth in thirdparty_queries.py can cite stable
(document, page) targets. PDFs are rendered with the same writer as the
authored corpus and ingested through the full pdf->chunk->embed path.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Tuple

# pydoc topics chosen for substance (multi-page bodies of real prose)
PYDOC_TOPICS = [
    "assignment", "booleans", "callable-types", "calls", "class",
    "comparisons", "context-managers", "debugger", "del", "dict",
    "exceptions", "for", "formatstrings", "function", "identifiers",
    "import", "lambda", "naming", "numbers", "objects", "operator-summary",
    "sequence-types", "slicings", "specialattrs", "string-methods",
    "truth", "try", "typesfunctions", "typesmapping", "typesseq",
    "while", "with",
]

PYGAME_REFS = [
    "display", "draw", "event", "font", "image", "key", "mixer", "mouse",
    "rect", "sprite", "surface", "time", "transform", "music",
]

PAGE_CHARS = 1100
MAX_PAGES = 5


def _clean_rst(text: str) -> str:
    """Strip reStructuredText scaffolding down to prose."""
    out: List[str] = []
    for line in text.splitlines():
        s = line.strip()
        if not s:
            out.append("")
            continue
        if s.startswith("..") or s.startswith(":") or s.startswith("|"):
            continue
        if set(s) <= set("=-~^*\""):  # section underlines
            continue
        out.append(line.rstrip())
    text = "\n".join(out)
    text = re.sub(r"``([^`]*)``", r"\1", text)
    text = re.sub(r"\*\*?([^*]*)\*\*?", r"\1", text)
    text = re.sub(r"\n{3,}", "\n\n", text)
    return text.strip()


def _paginate(text: str) -> List[str]:
    """Split prose into <= MAX_PAGES pages of ~PAGE_CHARS chars, breaking
    at paragraph boundaries (deterministic)."""
    paras = [p.strip() for p in text.split("\n\n") if p.strip()]
    pages: List[str] = []
    cur: List[str] = []
    size = 0
    for p in paras:
        if size + len(p) > PAGE_CHARS and cur:
            pages.append("\n\n".join(cur))
            cur, size = [], 0
            if len(pages) == MAX_PAGES:
                break
        cur.append(p)
        size += len(p) + 2
    if cur and len(pages) < MAX_PAGES:
        pages.append("\n\n".join(cur))
    # merge stub pages (lone headings, short tails) into a neighbor so
    # every page is substantive — deterministic forward merge, backward
    # for a short final page
    merged: List[str] = []
    for p in pages:
        if merged and len(merged[-1]) < 200:
            merged[-1] = merged[-1] + "\n\n" + p
        else:
            merged.append(p)
    if len(merged) > 1 and len(merged[-1]) < 200:
        tail = merged.pop()
        merged[-1] = merged[-1] + "\n\n" + tail
    return merged


def _pydoc_docs() -> List[dict]:
    import pydoc_data.topics as t

    docs = []
    for name in PYDOC_TOPICS:
        body = t.topics.get(name)
        if not body:
            continue
        pages = _paginate(_clean_rst(body))
        if len(pages) >= 2:
            docs.append(
                {
                    "doc": f"python_ref_{name.replace('-', '_')}.pdf",
                    "category": "python_reference",
                    "pages": pages,
                }
            )
    return docs


def _pygame_dir() -> Optional[str]:
    try:
        import pygame
    except Exception:  # noqa: BLE001
        return None
    d = os.path.join(
        os.path.dirname(pygame.__file__),
        "docs", "generated", "_sources", "ref",
    )
    return d if os.path.isdir(d) else None


def _pygame_docs() -> List[dict]:
    d = _pygame_dir()
    if d is None:
        return []
    docs = []
    for name in PYGAME_REFS:
        path = os.path.join(d, f"{name}.rst.txt")
        if not os.path.exists(path):
            continue
        with open(path, encoding="utf-8", errors="replace") as f:
            body = f.read()
        pages = _paginate(_clean_rst(body))
        if len(pages) >= 2:
            docs.append(
                {
                    "doc": f"pygame_ref_{name}.pdf",
                    "category": "pygame_reference",
                    "pages": pages,
                }
            )
    return docs


def thirdparty_docs() -> List[dict]:
    """All third-party documents (deterministic order)."""
    return _pydoc_docs() + _pygame_docs()


def available() -> bool:
    """True when the local sources exist (pydoc always does)."""
    return len(thirdparty_docs()) >= 20


def generate_thirdparty_corpus(documents_dir: str) -> List[str]:
    """Render the third-party documents as PDFs (same writer as the
    authored corpus — the point is exercising the real ingest path)."""
    from eval_harness.corpus import _ascii, _make_pdf, _wrap_page

    os.makedirs(documents_dir, exist_ok=True)
    names = []
    for doc in thirdparty_docs():
        path = os.path.join(documents_dir, doc["doc"])
        pages = [_wrap_page(_ascii(p)) for p in doc["pages"]]
        with open(path, "wb") as f:
            f.write(_make_pdf(pages))
        names.append(doc["doc"])
    return names


def page_index() -> Dict[Tuple[str, int], str]:
    """(doc, 1-based page) -> page text, for authoring/verifying gold."""
    out = {}
    for doc in thirdparty_docs():
        for i, page in enumerate(doc["pages"], 1):
            out[(doc["doc"], i)] = page
    return out


def generate_thirdparty_ground_truth(path: str) -> int:
    """Write the third-party split's ground truth JSONL."""
    import json

    from eval_harness.thirdparty_queries import (
        THIRDPARTY_QUERIES,
        THIRDPARTY_REJECTION_QUERIES,
    )

    cat = {d["doc"]: d["category"] for d in thirdparty_docs()}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    rows = []
    for qn, (query, doc, page, difficulty, gist) in enumerate(
        THIRDPARTY_QUERIES, 1
    ):
        rows.append(
            {
                "query_id": f"T{qn:03d}",
                "query": query,
                "category": cat.get(doc, "thirdparty"),
                "difficulty": difficulty,
                "is_rejection": False,
                "gold_references": [
                    {"document": doc, "page": page, "relevance": 3}
                ],
                "expected_answer_gist": gist,
                "notes": "third-party corpus (pydoc topics + pygame docs)",
            }
        )
    for i, query in enumerate(THIRDPARTY_REJECTION_QUERIES):
        rows.append(
            {
                "query_id": f"T{len(THIRDPARTY_QUERIES) + i + 1:03d}",
                "query": query,
                "category": "rejection",
                "difficulty": "hard",
                "is_rejection": True,
                "gold_references": [],
                "expected_answer_gist": "no relevant content exists",
                "notes": "third-party corpus (pydoc topics + pygame docs)",
            }
        )
    with open(path, "w", encoding="utf-8") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    return len(rows)


if __name__ == "__main__":
    # manifest dump for query authoring
    for doc in thirdparty_docs():
        for i, page in enumerate(doc["pages"], 1):
            head = " ".join(page.split())[:180]
            print(f"{doc['doc']} p{i}: {head}")
