"""RagEngine end-to-end tests with the deterministic fake encoder, including
first-stage parity against the NumPy oracle of the reference algorithm."""

import numpy as np
import pytest

from rust_local_rag_tpu.config import QueryWeights, reset_weight_cache
from rust_local_rag_tpu.engine import RagEngine
from rust_local_rag_tpu.models import EmbeddingService, HashEncoder
from rust_local_rag_tpu.models.reranker import FakeReranker
from rust_local_rag_tpu.models.reranker_service import RerankerService

import oracle
import pdfgen

DIM = 64

DOCS = {
    "physics.pdf": (
        "QUANTUM MECHANICS\n\n"
        "Quantum entanglement links particle states across distance. "
        "Measurement of one particle constrains the other instantly. "
        "Bell inequalities test local hidden variable theories.\n\n"
        "Wave functions collapse upon observation according to the "
        "Copenhagen interpretation of quantum theory."
    ),
    "cooking.pdf": (
        "BREAD BAKING\n\n"
        "Sourdough bread requires a fermented starter culture of wild yeast. "
        "Kneading develops gluten structure in the dough. "
        "Proofing time depends on ambient temperature and hydration.\n\n"
        "Bake the loaf at high temperature with steam for a crisp crust."
    ),
    "finance.pdf": (
        "PORTFOLIO THEORY\n\n"
        "Diversification reduces idiosyncratic risk in a portfolio. "
        "The efficient frontier maps optimal risk and return combinations. "
        "Sharpe ratios measure risk-adjusted performance of strategies.\n\n"
        "Value at risk estimates maximum expected loss at a confidence level."
    ),
}


@pytest.fixture
def engine(tmp_path):
    svc = EmbeddingService(HashEncoder(dim=DIM, model_name="fake-test-model"))
    eng = RagEngine(str(tmp_path), svc, reranker=None)
    for name, body in DOCS.items():
        eng.add_document(name, pdfgen.make_pdf([body]))
    return eng


@pytest.fixture
def engine_reranked(tmp_path):
    svc = EmbeddingService(HashEncoder(dim=DIM, model_name="fake-test-model"))
    rr = RerankerService(FakeReranker(), prompt_template=None)
    eng = RagEngine(str(tmp_path), svc, reranker=rr)
    for name, body in DOCS.items():
        eng.add_document(name, pdfgen.make_pdf([body]))
    return eng


def test_ingest_and_stats(engine):
    stats = engine.get_stats()
    assert stats["documents"] == 3
    assert stats["chunks"] >= 3
    assert stats["status"] == "ready"
    assert stats["embedding_model"] == "fake-test-model"
    assert stats["reranker_model"] is None
    assert engine.list_documents() == sorted(DOCS.keys())


def test_search_topical_ranking(engine):
    res = engine.search("sourdough starter yeast bread", top_k=3)
    assert res
    assert res[0].document == "cooking.pdf"
    # score breakdown present
    assert res[0].embedding_score is not None
    assert res[0].lexical_score is not None
    assert res[0].initial_score is not None
    assert res[0].reranker_score is None


def test_search_empty_index(tmp_path):
    svc = EmbeddingService(HashEncoder(dim=DIM))
    eng = RagEngine(str(tmp_path), svc)
    assert eng.search("anything", 5) == []


def test_search_respects_top_k(engine):
    res = engine.search("risk portfolio diversification", top_k=2)
    assert len(res) <= 2


def test_hash_skip_reingest(engine):
    pdf = pdfgen.make_pdf([DOCS["physics.pdf"]])
    assert engine.add_document("physics.pdf", pdf) == 0  # unchanged -> skip


def test_changed_document_replaces_chunks(engine):
    before = engine.get_stats()["chunks"]
    new_pdf = pdfgen.make_pdf(["Entirely new physics content about relativity."])
    n = engine.add_document("physics.pdf", new_pdf)
    assert n >= 1
    after = engine.get_stats()["chunks"]
    assert engine.get_stats()["documents"] == 3
    # old physics chunks gone
    res = engine.search("quantum entanglement particle states", top_k=3)
    assert all(
        "entanglement" not in r.text.lower() for r in res
    )
    del before, after


def test_first_stage_parity_with_oracle(engine):
    """The fused device first stage must match the NumPy port of the
    reference's scoring loop on ranking and scores."""
    reset_weight_cache()
    query = "efficient frontier risk return"
    top_k = 4

    res = engine.search(query, top_k=top_k)

    # Build the oracle's view: all chunks + dense lex vector
    emb_rows, metas = engine.store.snapshot_host()
    q = oracle.normalize(engine.embedding_service.get_query_embedding(query))
    lex_pairs = dict(engine.lexical_index.score(query, top_k * 5))
    lex = np.array(
        [lex_pairs.get(m.id, 0.0) for m in metas], dtype=np.float32
    )
    rows = oracle.brute_force_search(
        q, emb_rows, lex, 0.7, 0.3, max(top_k * 3, top_k)
    )
    want_ids = [metas[i].id for i, _, _, _ in rows[:top_k]]
    got_ids = [r.chunk_id for r in res]
    assert got_ids == want_ids
    for r, (_, combined, embs, lexn) in zip(res, rows):
        assert r.score == pytest.approx(combined, abs=1e-5)
        assert r.embedding_score == pytest.approx(embs, abs=1e-5)
        assert r.lexical_score == pytest.approx(lexn, abs=1e-5)


def test_per_query_weights_override(engine):
    # pure lexical: chunk containing the rare term must win
    res_lex = engine.search(
        "sharpe", top_k=1, weights=QueryWeights(embedding=0.0, lexical=1.0)
    )
    assert res_lex
    assert "sharpe" in res_lex[0].text.lower()
    # invalid overrides silently fall back to defaults
    res_bad = engine.search(
        "sharpe", top_k=1, weights=QueryWeights(embedding=float("nan"), lexical=7.0)
    )
    assert res_bad


def test_diversity_zero_equals_plain_search(engine):
    a = engine.search("risk and return", top_k=3)
    b = engine.search_with_diversity("risk and return", 3, 0.0)
    assert [r.chunk_id for r in a] == [r.chunk_id for r in b]


def test_diversity_selects_subset_in_mmr_order(engine):
    pool = max(3 * 3, 3 + 10)
    plain = engine.search("bread dough yeast baking", top_k=pool)
    div = engine.search_with_diversity("bread dough yeast baking", 3, 0.5)
    assert len(div) <= 3
    assert div
    # first result is the top plain result (MMR first pick)
    assert div[0].chunk_id == plain[0].chunk_id
    plain_ids = {r.chunk_id for r in plain}
    assert all(r.chunk_id in plain_ids for r in div)


def test_diversity_clamps_factor(engine):
    res = engine.search_with_diversity("bread", 2, 5.0)  # clamped to 1.0
    assert len(res) <= 2


def test_rerank_blending_and_breakdown(engine_reranked):
    res = engine_reranked.search("gluten dough kneading", top_k=3)
    assert res
    top = res[0]
    assert top.reranker_score is not None
    assert top.yes_logprob is not None
    assert top.no_logprob is not None
    # blended score formula: w_r * rr/max_rr + w_i * init/max_init
    max_rr = max(r.reranker_score for r in res if r.reranker_score is not None)
    max_init = max(r.initial_score for r in res)
    for r in res:
        if r.reranker_score is None:
            continue
        want = 0.7 * (r.reranker_score / max_rr) + 0.3 * (r.initial_score / max_init)
        # max_init here is over returned results only; recompute loosely
        assert r.score <= 1.0 + 1e-6
        del want
    # descending order
    scores = [r.score for r in res]
    assert scores == sorted(scores, reverse=True)


def test_rerank_yes_no_softmax_formula(engine_reranked):
    res = engine_reranked.search("sourdough starter", top_k=2)
    for r in res:
        if r.yes_logprob is not None:
            assert r.reranker_score == pytest.approx(
                oracle.yes_no_softmax(r.yes_logprob, r.no_logprob), abs=1e-6
            )


def test_get_embedding_candidates_sorted(engine):
    cands = engine.get_embedding_candidates("portfolio risk", 5)
    assert cands
    scores = [c.initial_score for c in cands]
    assert scores == sorted(scores, reverse=True)


def test_persistence_roundtrip(tmp_path):
    svc = EmbeddingService(HashEncoder(dim=DIM, model_name="fake-test-model"))
    eng = RagEngine(str(tmp_path), svc)
    eng.add_document("cooking.pdf", pdfgen.make_pdf([DOCS["cooking.pdf"]]))
    res1 = eng.search("sourdough", 2)

    # new engine instance loads from disk
    svc2 = EmbeddingService(HashEncoder(dim=DIM, model_name="fake-test-model"))
    eng2 = RagEngine(str(tmp_path), svc2)
    assert len(eng2.store) == len(eng.store)
    res2 = eng2.search("sourdough", 2)
    assert [r.chunk_id for r in res1] == [r.chunk_id for r in res2]
    np.testing.assert_allclose(
        [r.score for r in res1], [r.score for r in res2], rtol=1e-6
    )
    # hash skip works across restarts
    assert eng2.add_document("cooking.pdf", pdfgen.make_pdf([DOCS["cooking.pdf"]])) == 0


def test_calibrate_via_engine(engine_reranked):
    cands = engine_reranked.get_embedding_candidates("bread", 4)
    stats = engine_reranked.reranker.calibrate_timeout("bread", cands, 3)
    assert stats.sample_size == 3
    assert stats.p99_ms >= stats.median_ms >= 0.0


def test_rejection_threshold_param(engine):
    """Engine-level rejection: results below the absolute dense-cosine
    confidence are dropped, possibly returning nothing (the mechanism the
    reference lacks — its eval judges rejection client-side only)."""
    q = list(DOCS.values())[0].split()[0]
    full = engine.search(q, 3)
    assert full
    # an impossible bar rejects everything
    assert engine.search(q, 3, rejection_threshold=1.1) == []
    # a zero threshold (explicit) keeps everything
    kept = engine.search(q, 3, rejection_threshold=0.0)
    assert [r.chunk_id for r in kept] == [r.chunk_id for r in full]
    # threshold between the scores splits the result list
    mid = (full[0].embedding_score + full[-1].embedding_score) / 2
    some = engine.search(q, 3, rejection_threshold=mid)
    assert 0 < len(some) <= len(full)
    assert all(r.embedding_score >= mid for r in some)


def test_rejection_gate_uses_reranker_confidence(engine_reranked):
    """With reranking on, the rejection floor reads the judge's absolute
    yes-probability (reranker_score), NOT the cosine — this is the
    gate-judge serving mode (baseline.yaml: weight 0.0, threshold 0.06):
    results the judge is unconfident about are pruned from the pool even
    when their cosine is high."""
    q = list(DOCS.values())[0].split()[0]
    full = engine_reranked.search(q, 3)
    assert full and all(r.reranker_score is not None for r in full)
    scores = sorted(r.reranker_score for r in full)
    # a floor above every judge confidence empties the result list even
    # though cosines are high
    assert engine_reranked.search(
        q, 3, rejection_threshold=scores[-1] + 0.01) == []
    # a floor between judge confidences filters BY reranker_score
    if scores[0] < scores[-1]:
        mid = (scores[0] + scores[-1]) / 2
        some = engine_reranked.search(q, 3, rejection_threshold=mid)
        assert 0 < len(some) < len(full)
        assert all(r.reranker_score >= mid for r in some)
    # with the reranker toggled off per-request, the SAME threshold
    # applies to the cosine instead
    cos_off = engine_reranked.search(
        q, 3, rejection_threshold=1.1, use_reranker=False)
    assert cos_off == []


def test_rejection_threshold_env(tmp_path, monkeypatch):
    monkeypatch.setenv("RAG_TPU_REJECTION_THRESHOLD", "1.1")
    svc = EmbeddingService(HashEncoder(dim=DIM, model_name="fake-test-model"))
    eng = RagEngine(str(tmp_path), svc, reranker=None)
    eng.add_document("a.pdf", pdfgen.make_pdf(["Some words about gardens."]))
    assert eng.search("gardens", 3) == []
    # per-request override beats the env default
    assert eng.search("gardens", 3, rejection_threshold=0.0)


def test_use_reranker_false_skips_rerank(engine_reranked):
    q = list(DOCS.values())[0].split()[0]
    on = engine_reranked.search(q, 3)
    off = engine_reranked.search(q, 3, use_reranker=False)
    assert any(r.reranker_score is not None for r in on)
    assert all(r.reranker_score is None for r in off)


def test_reload_replaces_instead_of_duplicating(tmp_path):
    """load_from_disk has REPLACE semantics like the reference's
    apply_loaded_state (rag_engine.rs:1655-1709): calling it on an engine
    that already holds the index must not duplicate chunk ids or crash."""
    svc = EmbeddingService(HashEncoder(dim=DIM, model_name="fake-test-model"))
    eng = RagEngine(str(tmp_path), svc)
    eng.add_document("cooking.pdf", pdfgen.make_pdf([DOCS["cooking.pdf"]]))
    eng.save_to_disk()
    n = len(eng.store)
    res1 = eng.search("sourdough", 2)

    eng.load_from_disk()  # second load on a warm engine
    assert len(eng.store) == n
    res2 = eng.search("sourdough", 2)
    assert [r.chunk_id for r in res1] == [r.chunk_id for r in res2]
    # lexical index was rebuilt, not doubled: scores identical
    np.testing.assert_allclose(
        [r.score for r in res1], [r.score for r in res2], rtol=1e-6
    )


def test_unseen_mass_gate_param(engine):
    """JOINT unseen-term gate: a query whose informative terms the corpus
    has never indexed returns NOTHING when the gate is armed (per-request
    override), while an in-vocabulary query is untouched — in both the
    object lane and the columnar hot lane."""
    junk = "zebra xylophone quasar nebular"
    gold = "quantum entanglement particle states"
    assert engine.search(junk, 3)  # gate off: least-bad results come back
    # pure-mass rule (cos ceiling 1.0 admits any cosine)
    assert engine.search(
        junk, 3, rejection_unseen_mass=0.5, rejection_unseen_cos=1.0
    ) == []
    kept = engine.search(
        gold, 3, rejection_unseen_mass=0.5, rejection_unseen_cos=1.0
    )
    assert [r.chunk_id for r in kept] == [
        r.chunk_id for r in engine.search(gold, 3)
    ]
    # a cosine ceiling BELOW the junk query's best pool cosine disarms the
    # gate: good-cosine queries survive however novel their wording
    best = max(r.embedding_score for r in engine.search(junk, 3))
    assert engine.search(
        junk, 3,
        rejection_unseen_mass=0.5,
        rejection_unseen_cos=best - 0.01,
    )
    # columnar hot lane applies the same gate at fetch time
    pending = engine.dispatch_search(
        [junk, gold], 3,
        rejection_unseen_mass=0.5, rejection_unseen_cos=1.0,
    )
    col = engine.fetch_columnar(pending)
    assert engine.results_from_columnar(col, 0) == []
    assert [r.chunk_id for r in engine.results_from_columnar(col, 1)] == [
        r.chunk_id for r in engine.search(gold, 3)
    ]


def test_unseen_mass_gate_env(tmp_path, monkeypatch):
    """Env defaults arm the gate engine-wide; per-request override wins."""
    monkeypatch.setenv("RAG_TPU_REJECTION_UNSEEN_MASS", "0.5")
    monkeypatch.setenv("RAG_TPU_REJECTION_UNSEEN_COS", "1.0")
    svc = EmbeddingService(HashEncoder(dim=DIM, model_name="fake-test-model"))
    eng = RagEngine(str(tmp_path), svc, reranker=None)
    eng.add_document("a.pdf", pdfgen.make_pdf(["Some words about gardens."]))
    assert eng.search("zebra xylophone", 3) == []
    assert eng.search("gardens words", 3)
    # per-request disarm beats the env default
    assert eng.search("zebra xylophone", 3, rejection_unseen_mass=0.0)


def test_unseen_mass_gate_reranked_lane(engine_reranked):
    """The gate empties junk queries in the reranked object lane too."""
    junk = "zebra xylophone quasar nebular"
    assert engine_reranked.search(junk, 3)
    assert engine_reranked.search(
        junk, 3, rejection_unseen_mass=0.5, rejection_unseen_cos=1.0
    ) == []
