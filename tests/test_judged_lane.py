"""Judge-gated hot lane (quality config: reranker blend weight 0, judge
yes-probability as a rejection floor) must agree with the object lane
(search_batch) result-for-result — ids, order, scores, judge fields, and
gate behavior — both via the engine's dispatch/judge/fetch split and via
the batcher + native serializer end to end."""

import json

import numpy as np
import pytest

from rust_local_rag_tpu.config import QueryWeights
from rust_local_rag_tpu.engine import RagEngine
from rust_local_rag_tpu.models import EmbeddingService, HashEncoder
from rust_local_rag_tpu.models.reranker import FakeReranker
from rust_local_rag_tpu.models.reranker_service import RerankerService
from rust_local_rag_tpu.server.batcher import SearchBatcher
from rust_local_rag_tpu.server.serializer import native_serializer_available
from rust_local_rag_tpu.utils.rwlock import RwLock

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

GATE_W = QueryWeights(reranker=0.0, initial=1.0)


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    svc = EmbeddingService(HashEncoder(dim=128, model_name="judged-test"))
    rr = RerankerService(FakeReranker())
    eng = RagEngine(str(tmp_path_factory.mktemp("jl")), svc, reranker=rr)
    for name, body in DOCS.items():
        eng.add_document(name, pdfgen.make_pdf([body]))
    return eng


def _judged_columnar(engine, queries, top_k, thr=None, cosf=None, qf=None):
    pending = engine.dispatch_search(
        queries, top_k, GATE_W,
        rejection_threshold=0.0, rejection_cosine_floor=0.0,
    )
    assert pending is not None
    pj = engine.judge_columnar(
        pending, queries, weights=GATE_W,
        rejection_threshold=thr, rejection_cosine_floor=cosf,
        rejection_query_floor=qf,
    )
    return engine.fetch_judged(pj)


def _assert_result_parity(obj_res, hot_res):
    assert [r.chunk_id for r in obj_res] == [r.chunk_id for r in hot_res]
    for a, b in zip(obj_res, hot_res):
        np.testing.assert_allclose(a.score, b.score, rtol=1e-5)
        np.testing.assert_allclose(
            a.initial_score, b.initial_score, rtol=1e-5
        )
        np.testing.assert_allclose(
            a.reranker_score, b.reranker_score, rtol=1e-5
        )
        np.testing.assert_allclose(a.yes_logprob, b.yes_logprob, rtol=1e-5)
        np.testing.assert_allclose(a.no_logprob, b.no_logprob, rtol=1e-5)
        assert a.document == b.document
        assert a.page_number == b.page_number


def test_judged_lane_matches_object_lane(engine):
    assert engine.supports_judged_columnar(GATE_W, True)
    obj = engine.search_batch(QUERIES, 3, GATE_W, use_reranker=True)
    jc = _judged_columnar(engine, QUERIES, 3)
    for qi in range(len(QUERIES)):
        _assert_result_parity(obj[qi], engine.results_from_judged(jc, qi))


def test_judged_lane_joint_gate_matches_object_lane(engine):
    """The joint gate (judge floor AND cosine floor) must drop the same
    rows in both lanes, including full rejection of off-corpus junk."""
    queries = QUERIES + ["zxqv wvut qqqq junk asdf"]
    thr, cosf = 0.45, 0.05
    obj = engine.search_batch(
        queries, 3, GATE_W, use_reranker=True,
        rejection_threshold=thr, rejection_cosine_floor=cosf,
    )
    jc = _judged_columnar(engine, queries, 3, thr=thr, cosf=cosf)
    dropped_somewhere = False
    for qi in range(len(queries)):
        hot = engine.results_from_judged(jc, qi)
        _assert_result_parity(obj[qi], hot)
        if len(hot) < 3:
            dropped_somewhere = True
    assert dropped_somewhere, "gate never fired — thresholds too lax to test"


def test_query_floor_object_lane(engine):
    """QUERY-level rejection: a floor on the BEST judged yes-p rejects the
    whole junk query while real queries keep their FULL result list — no
    per-candidate filtering (the per-candidate threshold's gold-kill is
    exactly what this mode exists to avoid)."""
    junk = "zxqv wvut qqqq junk asdf"
    queries = QUERIES + [junk]
    ungated = engine.search_batch(queries, 3, GATE_W, use_reranker=True)
    junk_best = max(r.reranker_score for r in ungated[-1])
    floor = junk_best + 1e-4
    gated = engine.search_batch(
        queries, 3, GATE_W, use_reranker=True,
        rejection_query_floor=floor,
    )
    assert gated[-1] == []
    survivors = 0
    for qi in range(len(QUERIES)):
        best = max(r.reranker_score for r in ungated[qi])
        if best >= floor:
            # full list survives — including candidates BELOW the floor
            assert [r.chunk_id for r in gated[qi]] == [
                r.chunk_id for r in ungated[qi]
            ]
            survivors += 1
        else:
            assert gated[qi] == []
    assert survivors >= 2, "floor rejected almost everything — vacuous test"
    # floor is inert without the judge (no reranker scores to read)
    off = engine.search_batch(
        queries, 3, GATE_W, use_reranker=False,
        rejection_query_floor=floor,
    )
    assert len(off[-1]) > 0


def test_judged_lane_query_floor_matches_object_lane(engine):
    junk = "zxqv wvut qqqq junk asdf"
    queries = QUERIES + [junk]
    ungated = engine.search_batch(queries, 3, GATE_W, use_reranker=True)
    junk_best = max(r.reranker_score for r in ungated[-1])
    floor = junk_best + 1e-4
    obj = engine.search_batch(
        queries, 3, GATE_W, use_reranker=True,
        rejection_query_floor=floor,
    )
    jc = _judged_columnar(engine, queries, 3, qf=floor)
    assert engine.results_from_judged(jc, len(queries) - 1) == []
    for qi in range(len(queries)):
        _assert_result_parity(obj[qi], engine.results_from_judged(jc, qi))


def test_judged_lane_not_used_for_nonzero_reranker_weight(engine):
    assert not engine.supports_judged_columnar(
        QueryWeights(reranker=0.5, initial=0.5), True
    )
    assert not engine.supports_judged_columnar(GATE_W, False)
    # default weights (reference 0.7/0.3 blend) stay on the object lane
    assert not engine.supports_judged_columnar(None, True)


def test_dispatch_fetch_split_matches_score_prompts(engine):
    rr = engine.reranker
    prompts = [
        rr.build_prompt(QUERIES[0], c)
        for c in engine.get_embedding_candidates(QUERIES[0], 3)
    ]
    sync = rr.score_prompts(prompts)
    split = rr.fetch_prompts(rr.dispatch_prompts(prompts))
    np.testing.assert_allclose(np.asarray(sync), np.asarray(split), rtol=1e-7)


def test_batcher_routes_quality_config_to_judge_lane(engine):
    b = SearchBatcher(engine, RwLock(), window_ms=1)
    try:
        out = b.search(
            QUERIES[0], 3, 0.0, GATE_W,
            rejection_threshold=0.0, use_reranker=True,
        )
        ref = engine.search(QUERIES[0], 3, GATE_W, use_reranker=True)
        _assert_result_parity(ref, out)
    finally:
        b.stop()


@pytest.mark.skipif(
    not native_serializer_available(), reason="native serializer not built"
)
def test_batcher_judge_payload_matches_object_json(engine):
    """want_payload requests on the judge lane resolve to native-serialized
    bytes whose parsed content matches the object lane's to_dict JSON."""
    b = SearchBatcher(engine, RwLock(), window_ms=1)
    try:
        thr = 0.45
        fut = b.submit(
            QUERIES[1], 3, 0.0, GATE_W,
            rejection_threshold=thr, use_reranker=True, want_payload=True,
        )
        body = fut.result(timeout=30)
        assert isinstance(body, (bytes, bytearray))
        rows = json.loads(body)["results"]
        ref = engine.search(
            QUERIES[1], 3, GATE_W,
            rejection_threshold=thr, use_reranker=True,
        )
        assert [r["chunk_id"] for r in rows] == [r.chunk_id for r in ref]
        for row, r in zip(rows, ref):
            assert row["text"] == r.text
            assert row["document"] == r.document
            assert row["page_number"] == r.page_number
            np.testing.assert_allclose(row["score"], r.score, atol=2e-6)
            np.testing.assert_allclose(
                row["initial_score"], r.initial_score, atol=2e-6
            )
            np.testing.assert_allclose(
                row["reranker_score"], r.reranker_score, atol=2e-6
            )
            np.testing.assert_allclose(
                row["yes_logprob"], r.yes_logprob, atol=2e-6
            )
            np.testing.assert_allclose(
                row["no_logprob"], r.no_logprob, atol=2e-6
            )
    finally:
        b.stop()


def test_judged_lane_unseen_gate_matches_object_lane(engine):
    """The JOINT unseen-term gate empties a never-indexed-vocabulary junk
    query identically in the judged hot lane and the object lane, and the
    hot lane skips the junk query's judge forward entirely (its slot row
    is invalidated before prompts are built)."""
    junk = "zebra xylophone quasar nebular"
    queries = QUERIES + [junk]
    obj = engine.search_batch(
        queries, 3, GATE_W, use_reranker=True,
        rejection_unseen_mass=0.75, rejection_unseen_cos=1.0,
    )
    assert obj[-1] == []
    assert all(obj[qi] for qi in range(len(QUERIES)))
    pending = engine.dispatch_search(
        queries, 3, GATE_W,
        rejection_threshold=0.0, rejection_cosine_floor=0.0,
        rejection_unseen_mass=0.75, rejection_unseen_cos=1.0,
    )
    pj = engine.judge_columnar(pending, queries, weights=GATE_W)
    # the junk query contributed no judge prompts
    assert int(pj.flat_qi.max()) < len(QUERIES)
    jc = engine.fetch_judged(pj)
    for qi in range(len(QUERIES)):
        _assert_result_parity(obj[qi], engine.results_from_judged(jc, qi))
    assert engine.results_from_judged(jc, len(QUERIES)) == []


def test_unseen_gate_judge_rescue(engine):
    """3-way unseen gate: a confident judged yes anywhere in the head
    vetoes the unseen kill (paraphrase gold has novel wording but a
    recognizable gold passage); with the rescue bar above every judged
    yes-p the kill fires — identically in both lanes."""
    junk = "zebra xylophone quasar nebular"
    queries = QUERIES + [junk]
    # measure the junk head's judged yes-p range through the object lane
    base = engine.search_batch([junk], 3, GATE_W, use_reranker=True)[0]
    assert base
    ymax = max(r.reranker_score for r in base)
    lo, hi = ymax - 0.01, ymax + 0.01

    def both_lanes(c):
        obj = engine.search_batch(
            queries, 3, GATE_W, use_reranker=True,
            rejection_unseen_mass=0.75, rejection_unseen_cos=1.0,
            rejection_unseen_judge=c,
        )
        pending = engine.dispatch_search(
            queries, 3, GATE_W,
            rejection_threshold=0.0, rejection_cosine_floor=0.0,
        )
        pj = engine.judge_columnar(
            pending, queries, weights=GATE_W,
            rejection_unseen_mass=0.75, rejection_unseen_cos=1.0,
            rejection_unseen_judge=c,
        )
        jc = engine.fetch_judged(pj)
        hot = [
            engine.results_from_judged(jc, qi) for qi in range(len(queries))
        ]
        return obj, hot

    # rescue bar BELOW the head's best yes-p: the judge vetoes the kill
    obj, hot = both_lanes(lo)
    assert obj[-1] and hot[-1]
    # rescue bar ABOVE every judged yes-p: the kill fires
    obj, hot = both_lanes(hi)
    assert obj[-1] == [] and hot[-1] == []
    # in-vocabulary queries are untouched either way
    for qi in range(len(QUERIES)):
        assert obj[qi] and hot[qi]
