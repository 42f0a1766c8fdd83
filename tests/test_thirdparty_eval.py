"""Third-party eval split machinery (eval_harness/thirdparty.py): the
corpus builds deterministically from local sources, every gold reference
points at a real page, the rendered PDFs survive the REAL extraction
pipeline, and the split stays disjoint from the authored splits."""

from __future__ import annotations

import json

import pytest

from eval_harness.thirdparty import (
    available,
    generate_thirdparty_corpus,
    generate_thirdparty_ground_truth,
    page_index,
    thirdparty_docs,
)
from eval_harness.thirdparty_queries import (
    THIRDPARTY_QUERIES,
    THIRDPARTY_REJECTION_QUERIES,
)

pytestmark = pytest.mark.skipif(
    not available(), reason="third-party doc sources absent"
)


def test_corpus_is_deterministic_and_sized():
    docs = thirdparty_docs()
    again = thirdparty_docs()
    assert [d["doc"] for d in docs] == [d["doc"] for d in again]
    assert all(d["pages"] == e["pages"] for d, e in zip(docs, again))
    assert len(docs) >= 20
    for d in docs:
        assert 2 <= len(d["pages"]) <= 5
        for p in d["pages"]:
            assert len(p) > 200  # real prose, not markup residue


def test_gold_references_point_at_real_pages():
    idx = page_index()
    for query, doc, page, difficulty, gist in THIRDPARTY_QUERIES:
        assert (doc, page) in idx, (doc, page)
        assert difficulty in ("easy", "medium", "hard")
        assert query and gist


def test_split_disjoint_from_authored():
    from eval_harness.corpus_data import QUERIES, REJECTION_QUERIES
    from eval_harness.heldout_data import (
        HELDOUT_QUERIES,
        HELDOUT_REJECTION_QUERIES,
    )

    tp = {q for q, *_ in THIRDPARTY_QUERIES} | set(
        THIRDPARTY_REJECTION_QUERIES
    )
    other = (
        {q for q, *_ in QUERIES}
        | set(REJECTION_QUERIES)
        | {q for q, *_ in HELDOUT_QUERIES}
        | set(HELDOUT_REJECTION_QUERIES)
    )
    assert not tp & other
    assert len(tp) == len(THIRDPARTY_QUERIES) + len(
        THIRDPARTY_REJECTION_QUERIES
    )


def test_pdfs_roundtrip_through_real_extraction(tmp_path):
    from rust_local_rag_tpu.ingest.pdf import extract_pdf_text

    names = generate_thirdparty_corpus(str(tmp_path))
    assert len(names) >= 20
    # spot-check two documents through the real extractor: page count and
    # recognizable content survive
    docs = {d["doc"]: d for d in thirdparty_docs()}
    for name in (names[0], names[-1]):
        with open(tmp_path / name, "rb") as f:
            text = extract_pdf_text(f.read())
        pages = text.split("\f")
        assert len([p for p in pages if p.strip()]) == len(
            docs[name]["pages"]
        )
        probe = " ".join(docs[name]["pages"][0].split()[:4])
        assert probe.split()[0].lower() in text.lower()


def test_ground_truth_jsonl(tmp_path):
    path = tmp_path / "tp.jsonl"
    n = generate_thirdparty_ground_truth(str(path))
    rows = [json.loads(x) for x in path.read_text().splitlines()]
    assert n == len(rows) == len(THIRDPARTY_QUERIES) + len(
        THIRDPARTY_REJECTION_QUERIES
    )
    assert all(r["query_id"].startswith("T") for r in rows)
    assert sum(r["is_rejection"] for r in rows) == len(
        THIRDPARTY_REJECTION_QUERIES
    )
    # committed copy stays in sync
    committed = "eval_harness/ground_truth/queries_thirdparty.jsonl"
    with open(committed, encoding="utf-8") as f:
        assert f.read() == path.read_text(encoding="utf-8")


def test_training_holdout_covers_thirdparty():
    from eval_harness.corpus import passage_hashes
    from rust_local_rag_tpu.training.corpus import normalized_hash

    hashes = passage_hashes()
    some_page = thirdparty_docs()[0]["pages"][0]
    assert normalized_hash(some_page) in hashes
