"""Batched search paths must agree with single-query results."""

import numpy as np
import pytest

from rust_local_rag_tpu.engine import RagEngine
from rust_local_rag_tpu.models import EmbeddingService, HashEncoder
from rust_local_rag_tpu.models.reranker import FakeReranker
from rust_local_rag_tpu.models.reranker_service import RerankerService

import pdfgen

DOCS = {
    "space.pdf": "ASTRONOMY\n\nTelescopes observe distant galaxies. Spectroscopy reveals stellar composition.",
    "garden.pdf": "GARDENING\n\nTomato plants need sunlight and watering. Compost improves soil fertility.",
    "chess.pdf": "CHESS\n\nThe Sicilian defense answers the king pawn. Center control drives strategy.",
    "bread.pdf": "BAKING\n\nSourdough needs a wild yeast starter. Kneading develops gluten structure.",
}

QUERIES = [
    "tomato compost soil",
    "galaxies stellar telescopes",
    "sicilian defense chess",
    "sourdough yeast gluten",
]


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    svc = EmbeddingService(HashEncoder(dim=128, model_name="batch-test"))
    rr = RerankerService(FakeReranker())
    eng = RagEngine(str(tmp_path_factory.mktemp("b")), svc, reranker=rr)
    for name, body in DOCS.items():
        eng.add_document(name, pdfgen.make_pdf([body]))
    return eng


def test_search_batch_matches_single(engine):
    batched = engine.search_batch(QUERIES, 3)
    for q, batch_res in zip(QUERIES, batched):
        single = engine.search(q, 3)
        assert [r.chunk_id for r in single] == [r.chunk_id for r in batch_res]
        np.testing.assert_allclose(
            [r.score for r in single], [r.score for r in batch_res], rtol=1e-6
        )


def test_diversity_batch_matches_single(engine):
    batched = engine.search_with_diversity_batch(QUERIES, 3, 0.4)
    for q, batch_res in zip(QUERIES, batched):
        single = engine.search_with_diversity(q, 3, 0.4)
        assert [r.chunk_id for r in single] == [r.chunk_id for r in batch_res]


def test_diversity_batch_device_mmr_matches_host(engine, monkeypatch):
    """The batched on-device MMR path (used for large batches) must select
    the same chunks as the host-greedy path, modulo arbitrary tie order."""
    host = engine.search_with_diversity_batch(QUERIES, 3, 0.4)
    monkeypatch.setenv("RAG_TPU_BATCH_DEVICE_MMR", "1")
    dev = engine.search_with_diversity_batch(QUERIES, 3, 0.4)
    for h, d in zip(host, dev):
        assert [r.chunk_id for r in h] == [r.chunk_id for r in d]


def test_diversity_batch_device_mmr_empty_pool(engine, monkeypatch):
    monkeypatch.setenv("RAG_TPU_BATCH_DEVICE_MMR", "1")
    out = engine.search_with_diversity_batch(
        ["tomato compost", "zz-no-match-at-all"], 2, 0.5
    )
    assert len(out) == 2 and out[0]


def test_odd_batch_sizes_match_single(engine):
    """The query axis is padded to power-of-2 buckets on device; padded
    rows must never leak into results."""
    for nq in (1, 3, 5, 7):
        qs = [QUERIES[i % len(QUERIES)] for i in range(nq)]
        batched = engine.search_batch(qs, 3)
        assert len(batched) == nq
        for q, batch_res in zip(qs, batched):
            single = engine.search(q, 3)
            assert [r.chunk_id for r in single] == [
                r.chunk_id for r in batch_res
            ], f"nq={nq} q={q}"


def test_batch_with_empty_query_slot(engine):
    out = engine.search_batch(["tomato", ""], 2)
    assert len(out) == 2
    assert out[0]


def test_empty_batch(engine):
    assert engine.search_batch([], 3) == []
