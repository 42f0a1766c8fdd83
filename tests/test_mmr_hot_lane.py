"""Fused MMR hot lane (dispatch_search_mmr -> fetch_columnar) must agree
with the object-lane diversity search (search_with_diversity_batch), which
itself carries the reference's MMR semantics (rag_engine.rs:717-759)."""

import numpy as np
import pytest

from rust_local_rag_tpu.engine import RagEngine
from rust_local_rag_tpu.models import EmbeddingService, HashEncoder

import pdfgen

DOCS = {
    "space.pdf": "ASTRONOMY\n\nTelescopes observe distant galaxies. Spectroscopy reveals stellar composition. Radio arrays map the hydrogen line across the sky.",
    "garden.pdf": "GARDENING\n\nTomato plants need sunlight and watering. Compost improves soil fertility. Mulch keeps roots cool through summer heat.",
    "chess.pdf": "CHESS\n\nThe Sicilian defense answers the king pawn. Center control drives strategy. Endgame technique converts small advantages.",
    "bread.pdf": "BAKING\n\nSourdough needs a wild yeast starter. Kneading develops gluten structure. Steam in the oven sets an open crumb.",
}

QUERIES = [
    "tomato compost soil",
    "galaxies stellar telescopes",
    "sicilian defense chess",
    "sourdough yeast gluten",
]


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    svc = EmbeddingService(HashEncoder(dim=128, model_name="mmr-hot"))
    eng = RagEngine(str(tmp_path_factory.mktemp("m")), svc, reranker=None)
    for name, body in DOCS.items():
        eng.add_document(name, pdfgen.make_pdf([body]))
    return eng


def _hot(engine, queries, top_k, diversity, floor=None):
    pending = engine.dispatch_search_mmr(
        queries, top_k, diversity, rejection_cosine_floor=floor
    )
    assert pending is not None
    col = engine.fetch_columnar(pending)
    return [engine.results_from_columnar(col, qi) for qi in range(len(queries))]


@pytest.mark.parametrize("diversity", [0.1, 0.4, 0.9])
def test_matches_object_lane(engine, diversity):
    hot = _hot(engine, QUERIES, 3, diversity)
    obj = engine.search_with_diversity_batch(
        QUERIES, 3, diversity, use_reranker=False
    )
    for h, o in zip(hot, obj):
        assert [r.chunk_id for r in h] == [r.chunk_id for r in o]
        np.testing.assert_allclose(
            [r.score for r in h], [r.score for r in o], rtol=1e-5
        )
        np.testing.assert_allclose(
            [r.embedding_score for r in h],
            [r.embedding_score for r in o],
            rtol=1e-5,
        )


def test_diversity_reorders_vs_plain(engine):
    """High diversity must be able to change the plain ranking (otherwise
    the fused program is silently ignoring its MMR stage)."""
    hot = _hot(engine, QUERIES, 5, 0.95)
    plain = engine.search_batch(QUERIES, 5, use_reranker=False)
    assert any(
        [r.chunk_id for r in h] != [r.chunk_id for r in p]
        for h, p in zip(hot, plain)
    )
    # first pick is always the top-ranked candidate (swap_remove(0))
    for h, p in zip(hot, plain):
        assert h[0].chunk_id == p[0].chunk_id


def test_cosine_floor_gates_pool_before_mmr(engine):
    """The confidence floor must remove candidates BEFORE MMR selection
    (object-lane order: search_batch gates its output, then MMR selects
    from survivors)."""
    # pick a floor between the best and worst pool cosine of query 0
    pool = engine.search_batch(
        QUERIES[:1], 9, use_reranker=False
    )[0]
    cosines = sorted(r.embedding_score for r in pool)
    floor = (cosines[0] + cosines[-1]) / 2.0
    hot = _hot(engine, QUERIES[:1], 3, 0.5, floor=floor)[0]
    obj = engine.search_with_diversity_batch(
        QUERIES[:1], 3, 0.5,
        use_reranker=False, rejection_cosine_floor=floor,
    )[0]
    assert [r.chunk_id for r in hot] == [r.chunk_id for r in obj]
    assert all(r.embedding_score >= floor for r in hot)


def test_floor_above_everything_returns_empty(engine):
    hot = _hot(engine, QUERIES, 3, 0.5, floor=0.999)
    assert all(h == [] for h in hot)


def test_single_query_and_large_k(engine):
    hot = _hot(engine, QUERIES[:1], 50, 0.4)[0]
    obj = engine.search_with_diversity(
        QUERIES[0], 50, 0.4, use_reranker=False
    )
    assert [r.chunk_id for r in hot] == [r.chunk_id for r in obj]


def test_batcher_routes_diversity_to_mmr_lane(engine):
    """The micro-batcher must serve rerank-off diversity requests through
    the fused lane (one dispatch + one fetch), and its results must match
    the object lane."""
    from rust_local_rag_tpu.server.batcher import SearchBatcher
    from rust_local_rag_tpu.utils.rwlock import RwLock

    calls = []
    orig = engine.dispatch_search_mmr
    engine.dispatch_search_mmr = lambda *a, **k: calls.append(a) or orig(*a, **k)
    try:
        b = SearchBatcher(engine, RwLock(), window_ms=10, max_batch=16)
        futures = [
            b.submit(q, 3, 0.4, None, use_reranker=False) for q in QUERIES
        ]
        got = [f.result(timeout=30) for f in futures]
        b.stop()
    finally:
        engine.dispatch_search_mmr = orig
    assert calls, "diversity batch did not ride the fused MMR lane"
    obj = engine.search_with_diversity_batch(
        QUERIES, 3, 0.4, use_reranker=False
    )
    for h, o in zip(got, obj):
        assert [r.chunk_id for r in h] == [r.chunk_id for r in o]


def test_lane_declines_when_unsupported(engine, tmp_path):
    svc = EmbeddingService(HashEncoder(dim=128, model_name="mmr-hot-empty"))
    empty = RagEngine(str(tmp_path), svc, reranker=None)
    assert empty.dispatch_search_mmr(QUERIES, 3, 0.4) is None
    assert engine.dispatch_search_mmr([], 3, 0.4) is None
