"""Engine-level int8 corpus mode (RAG_TPU_INT8_CORPUS): full search paths
on the quantized slab, rankings near-identical to f32."""

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
}


def _engine(tmp_path, monkeypatch, int8: bool, reranker=False):
    if int8:
        monkeypatch.setenv("RAG_TPU_INT8_CORPUS", "1")
    else:
        monkeypatch.delenv("RAG_TPU_INT8_CORPUS", raising=False)
    svc = EmbeddingService(HashEncoder(dim=128, model_name="int8-test"))
    rr = RerankerService(FakeReranker()) if reranker else None
    eng = RagEngine(str(tmp_path), svc, reranker=rr)
    for name, body in DOCS.items():
        eng.add_document(name, pdfgen.make_pdf([body]))
    return eng


def test_int8_store_dtype(tmp_path, monkeypatch):
    eng = _engine(tmp_path / "a", monkeypatch, int8=True)
    assert eng.store.quantized
    assert str(eng.store.corpus().dtype) == "int8"


def test_int8_rankings_match_f32(tmp_path, monkeypatch):
    eng8 = _engine(tmp_path / "a", monkeypatch, int8=True)
    eng32 = _engine(tmp_path / "b", monkeypatch, int8=False)
    for query in ("tomato compost", "galaxies stellar", "sicilian defense"):
        r8 = eng8.search(query, 3)
        r32 = eng32.search(query, 3)
        assert [x.document for x in r8] == [x.document for x in r32], query
        # rescored f32 embedding scores within int8 quantization error
        for a, b in zip(r8, r32):
            assert a.embedding_score == pytest.approx(
                b.embedding_score, abs=2e-2
            )


def test_int8_diversity_and_rerank_paths(tmp_path, monkeypatch):
    eng = _engine(tmp_path / "a", monkeypatch, int8=True, reranker=True)
    res = eng.search_with_diversity("tomato compost watering", 2, 0.4)
    assert res
    assert res[0].document == "garden.pdf"
    assert res[0].reranker_score is not None


def test_int8_persistence_roundtrip(tmp_path, monkeypatch):
    eng = _engine(tmp_path / "a", monkeypatch, int8=True)
    before = eng.search("tomato compost", 2)
    # reload: persisted f32 (dequantized) re-quantizes deterministically
    svc = EmbeddingService(HashEncoder(dim=128, model_name="int8-test"))
    monkeypatch.setenv("RAG_TPU_INT8_CORPUS", "1")
    eng2 = RagEngine(str(tmp_path / "a"), svc)
    assert eng2.store.quantized
    after = eng2.search("tomato compost", 2)
    assert [r.chunk_id for r in before] == [r.chunk_id for r in after]
    # load renormalizes the dequantized rows before requantizing, so
    # scores drift within the int8 error budget
    np.testing.assert_allclose(
        [r.score for r in before], [r.score for r in after], atol=2e-3
    )


def test_int8_get_embedding_candidates(tmp_path, monkeypatch):
    eng = _engine(tmp_path / "a", monkeypatch, int8=True)
    cands = eng.get_embedding_candidates("tomato", 3)
    assert cands
    scores = [c.initial_score for c in cands]
    assert scores == sorted(scores, reverse=True)


def test_bf16_corpus_mode(tmp_path, monkeypatch):
    """RAG_TPU_CORPUS_DTYPE=bf16: half-memory slab, rankings stable."""
    monkeypatch.delenv("RAG_TPU_INT8_CORPUS", raising=False)
    monkeypatch.setenv("RAG_TPU_CORPUS_DTYPE", "bf16")
    svc = EmbeddingService(HashEncoder(dim=128, model_name="bf16-test"))
    eng = RagEngine(str(tmp_path), svc)
    for name, body in DOCS.items():
        eng.add_document(name, pdfgen.make_pdf([body]))
    assert str(eng.store.corpus().dtype) == "bfloat16"
    res = eng.search("tomato compost", 2)
    assert res and res[0].document == "garden.pdf"
