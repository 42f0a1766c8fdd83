"""End-to-end server tests: real aiohttp server on a local port, driven over
HTTP exactly like the eval harness / an MCP client would
(mcp_server.rs route surface + tools)."""

import asyncio
import json
import socket
import threading
import time

import pytest
import requests

from rust_local_rag_tpu.engine import RagEngine
from rust_local_rag_tpu.jobs import JobManager, WorkerSupervisor
from rust_local_rag_tpu.models import EmbeddingService, HashEncoder
from rust_local_rag_tpu.models.reranker import FakeReranker
from rust_local_rag_tpu.models.reranker_service import RerankerService
from rust_local_rag_tpu.server.http_api import AppContext, build_app
from rust_local_rag_tpu.utils.rwlock import RwLock

import pdfgen

DOCS = {
    "space.pdf": (
        "ASTRONOMY\n\nTelescopes observe distant galaxies and nebulae. "
        "Spectroscopy reveals the composition of stars."
    ),
    "garden.pdf": (
        "GARDENING\n\nTomato plants need full sun and regular watering. "
        "Compost improves soil structure and fertility."
    ),
}


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class ServerFixture:
    def __init__(self, tmp_path, with_reranker=True):
        self.data_dir = tmp_path / "data"
        self.docs_dir = tmp_path / "documents"
        self.data_dir.mkdir()
        self.docs_dir.mkdir()
        for name, body in DOCS.items():
            (self.docs_dir / name).write_bytes(pdfgen.make_pdf([body]))

        svc = EmbeddingService(HashEncoder(dim=128, model_name="server-test"))
        rr = (
            RerankerService(FakeReranker(model_name="fake-rr"))
            if with_reranker
            else None
        )
        self.engine = RagEngine(str(self.data_dir), svc, reranker=rr)
        self.lock = RwLock()
        self.jm = JobManager(str(self.data_dir / "jobs.db"))
        self.sup = WorkerSupervisor(
            self.jm, self.engine, self.lock, log_dir=str(tmp_path / "logs")
        )
        self.ctx = AppContext(
            self.engine, self.lock, self.jm, self.sup, str(self.docs_dir)
        )
        self.port = _free_port()
        self.base = f"http://127.0.0.1:{self.port}"
        self._loop = None
        self._thread = None

    def start(self):
        self.sup.start()
        from aiohttp import web

        app = build_app(self.ctx)
        self.app = app
        started = threading.Event()

        def run():
            # serve through the fast-path protocol — the shipped config
            # (app.py default) — so every server test exercises it
            from rust_local_rag_tpu.server.fastpath import FastPathProtocol

            self._loop = asyncio.new_event_loop()
            asyncio.set_event_loop(self._loop)
            runner = web.AppRunner(app)
            self._runner = runner
            self._loop.run_until_complete(runner.setup())
            loop = self._loop
            self._loop.run_until_complete(
                loop.create_server(
                    lambda: FastPathProtocol(runner.server, self.ctx, loop),
                    "127.0.0.1", self.port,
                )
            )
            started.set()
            self._loop.run_forever()
            self._loop.close()

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()
        assert started.wait(10)
        # wait for readiness
        for _ in range(50):
            try:
                if requests.get(f"{self.base}/readyz", timeout=1).status_code == 200:
                    return
            except requests.RequestException:
                pass
            time.sleep(0.1)
        raise RuntimeError("server did not become ready")

    def stop(self):
        self.sup.stop(timeout=2)
        # tasks (other than the cleanup coroutine itself) still pending
        # AFTER the app's cleanup contexts ran; anything here would become
        # asyncio's "Task was destroyed but it is pending!" on loop close
        self.pending_after_cleanup = None
        if self._loop:

            async def _cleanup():
                await self._runner.cleanup()
                cur = asyncio.current_task()
                return [t for t in asyncio.all_tasks() if t is not cur]

            try:
                self.pending_after_cleanup = asyncio.run_coroutine_threadsafe(
                    _cleanup(), self._loop
                ).result(10)
            except Exception:  # noqa: BLE001 — stop() must not raise
                pass
            self._loop.call_soon_threadsafe(self._loop.stop)
        if self._thread:
            self._thread.join(timeout=5)

    def mcp(self, method, params=None, rid=1):
        payload = {"jsonrpc": "2.0", "id": rid, "method": method}
        if params is not None:
            payload["params"] = params
        r = requests.post(f"{self.base}/mcp", json=payload, timeout=30)
        r.raise_for_status()
        return r.json()

    def tool(self, name, arguments=None):
        return self.mcp(
            "tools/call", {"name": name, "arguments": arguments or {}}
        )

    def reindex_and_wait(self, timeout=60.0):
        r = requests.post(f"{self.base}/reindex", timeout=10)
        assert r.status_code == 200, r.text
        job_id = r.json()["job_id"]
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            jr = requests.get(f"{self.base}/jobs/{job_id}", timeout=10).json()
            if jr["status"] in ("completed", "failed"):
                return jr
            time.sleep(0.1)
        raise TimeoutError("reindex did not finish")


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    fx = ServerFixture(tmp_path_factory.mktemp("srv"))
    fx.start()
    jr = fx.reindex_and_wait()
    assert jr["status"] == "completed"
    yield fx
    fx.stop()


def test_healthz_readyz(server):
    assert requests.get(f"{server.base}/healthz").status_code == 200
    assert requests.get(f"{server.base}/readyz").status_code == 200


def test_stats_endpoint(server):
    stats = requests.get(f"{server.base}/stats").json()
    assert stats["documents"] == 2
    assert stats["chunks"] >= 2
    assert stats["status"] == "ready"
    assert stats["embedding_model"] == "server-test"
    assert stats["reranker_model"] == "fake-rr"


def test_http_search(server):
    r = requests.post(
        f"{server.base}/search",
        json={"query": "tomato compost watering", "top_k": 2},
        timeout=30,
    )
    assert r.status_code == 200
    results = r.json()["results"]
    assert results
    assert results[0]["document"] == "garden.pdf"
    for key in ("text", "score", "chunk_id", "chunk_index", "page_number"):
        assert key in results[0]
    # reranked responses carry the score breakdown
    assert "reranker_score" in results[0]
    assert "yes_logprob" in results[0]


def test_http_search_clamps_top_k(server):
    r = requests.post(
        f"{server.base}/search",
        json={"query": "stars", "top_k": 10_000, "diversity_factor": 9.0},
        timeout=30,
    )
    assert r.status_code == 200
    assert len(r.json()["results"]) <= 100


def test_http_search_invalid_json(server):
    r = requests.post(
        f"{server.base}/search",
        data="{not json",
        headers={"Content-Type": "application/json"},
    )
    assert r.status_code == 400


def test_jobs_endpoints(server):
    # no active job after completion
    r = requests.get(f"{server.base}/jobs/active")
    assert r.status_code == 200
    assert r.json() is None
    # unknown job -> 404
    assert requests.get(f"{server.base}/jobs/nonexistent").status_code == 404


def test_reindex_conflict_while_running(tmp_path):
    fx = ServerFixture(tmp_path, with_reranker=False)
    fx.start()
    try:
        r1 = requests.post(f"{fx.base}/reindex")
        assert r1.status_code == 200
        # immediately racing a second reindex: 409 or (if the first finished
        # already) 200 — assert the invariant that at most one is active
        r2 = requests.post(f"{fx.base}/reindex")
        if r2.status_code == 409:
            assert "already in progress" in r2.text
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            jr = requests.get(f"{fx.base}/jobs/active").json()
            if jr is None:
                break
            time.sleep(0.1)
    finally:
        fx.stop()


# ----- MCP protocol -----

def test_mcp_initialize(server):
    out = server.mcp("initialize", {"protocolVersion": "2025-03-26"})
    res = out["result"]
    assert res["protocolVersion"] == "2025-03-26"
    assert res["serverInfo"]["name"] == "rust-local-rag-tpu"
    assert "tools" in res["capabilities"]


def test_mcp_tools_list(server):
    out = server.mcp("tools/list")
    names = {t["name"] for t in out["result"]["tools"]}
    assert names == {
        "search_documents",
        "list_documents",
        "get_stats",
        "start_reindex",
        "get_job_status",
        "calibrate_reranker",
    }


def test_mcp_search_documents_markdown(server):
    out = server.tool(
        "search_documents",
        {"query": "galaxies spectroscopy stars", "top_k": 2},
    )
    text = out["result"]["content"][0]["text"]
    assert text.startswith("Found ")
    assert "space.pdf" in text
    # markdown format: **1. [NN%] doc.pdf (page N)**
    import re

    assert re.search(r"\*\*1\. \[\d+%\] space\.pdf \(page \d+\)\*\*", text)


def test_mcp_search_with_weights(server):
    out = server.tool(
        "search_documents",
        {
            "query": "tomato",
            "top_k": 1,
            "weights": {"embedding": 0.0, "lexical": 1.0},
        },
    )
    text = out["result"]["content"][0]["text"]
    assert "garden.pdf" in text


def test_mcp_list_documents(server):
    out = server.tool("list_documents")
    text = out["result"]["content"][0]["text"]
    assert "Uploaded documents (2):" in text
    assert "1. garden.pdf" in text
    assert "2. space.pdf" in text


def test_mcp_get_stats(server):
    out = server.tool("get_stats")
    text = out["result"]["content"][0]["text"]
    assert text.startswith("RAG System Stats:")
    stats = json.loads(text.split("\n", 1)[1])
    assert stats["documents"] == 2


def test_mcp_get_job_status_not_found(server):
    out = server.tool("get_job_status", {"job_id": "missing"})
    assert "error" in out
    assert "not found" in out["error"]["message"]


def test_mcp_calibrate_reranker(server):
    out = server.tool(
        "calibrate_reranker", {"query": "stars", "sample_size": 3}
    )
    text = out["result"]["content"][0]["text"]
    assert "Reranker Calibration Results:" in text
    payload = json.loads(
        text.split("Reranker Calibration Results:\n", 1)[1].split("\n\nRecommendation")[0]
    )
    # sample_size is capped at the candidate count (2 docs -> >= 1 chunk each)
    assert 1 <= payload["calibration_stats"]["sample_size"] <= 3
    assert payload["recommended_timeout_ms"] >= 10_000


def test_mcp_unknown_tool(server):
    out = server.tool("bogus_tool")
    assert out["error"]["code"] == -32602


def test_mcp_unknown_method(server):
    out = server.mcp("bogus/method")
    assert out["error"]["code"] == -32601


def test_mcp_search_invalid_arg_types(server):
    """Bad search argument types are -32602 Invalid params (mirroring the
    HTTP handler's 400s), not -32603 internal errors; and a string
    use_reranker must not truthy-coerce into running the reranker."""
    for args in (
        {"query": "x", "rejection_threshold": "high"},
        {"query": "x", "top_k": "three"},
        {"query": "x", "diversity_factor": "lots"},
        {"query": "x", "use_reranker": "false"},
        {"query": "x", "weights": "heavy"},
        {"query": "x", "weights": [1, 2]},
        {"query": "x", "diversity_factor": "nan"},
        {"query": "x", "rejection_threshold": "inf"},
    ):
        out = server.tool("search_documents", args)
        assert out["error"]["code"] == -32602, args


def test_http_search_rejects_non_finite(server):
    # json.loads accepts NaN/Infinity literals; the clamp must not pass
    # them through
    for body in (
        '{"query": "x", "diversity_factor": NaN}',
        '{"query": "x", "rejection_threshold": Infinity}',
    ):
        r = requests.post(
            f"{server.base}/search", data=body,
            headers={"Content-Type": "application/json"}, timeout=10,
        )
        assert r.status_code == 400, body


def test_mcp_non_object_payload_invalid_request(server):
    """A JSON-RPC batch array (or any non-object JSON) gets -32600, not a
    500 (ADVICE r1)."""
    for payload in ([{"jsonrpc": "2.0", "id": 1, "method": "ping"}], "x", 7):
        r = requests.post(f"{server.base}/mcp", json=payload, timeout=10)
        assert r.status_code == 400
        assert r.json()["error"]["code"] == -32600


def test_mcp_notification_accepted(server):
    r = requests.post(
        f"{server.base}/mcp",
        json={"jsonrpc": "2.0", "method": "notifications/initialized"},
    )
    assert r.status_code == 202


def test_mcp_sse_accept(server):
    r = requests.post(
        f"{server.base}/mcp",
        json={"jsonrpc": "2.0", "id": 9, "method": "ping"},
        headers={"Accept": "text/event-stream"},
    )
    assert r.headers["Content-Type"].startswith("text/event-stream")
    assert r.text.startswith("event: message\ndata: ")


def test_format_parity_with_reference_example():
    """The exact formatting example from mcp_server.rs:644-688."""
    from rust_local_rag_tpu.engine.rag_engine import SearchResult
    from rust_local_rag_tpu.server.formatting import format_search_results

    results = [
        SearchResult(
            text="The quick brown fox jumps over the lazy dog.",
            score=0.8531, document="fox.pdf", chunk_id="chunk-123",
            chunk_index=0, page_number=1, section="Intro",
        ),
        SearchResult(
            text="Lorem ipsum dolor sit amet.",
            score=0.725, document="lorem.pdf", chunk_id="chunk-456",
            chunk_index=5, page_number=10, section=None,
        ),
    ]
    formatted = format_search_results(results)
    assert "**1. [85%] fox.pdf (page 1)**" in formatted
    assert "*Section: Intro*" in formatted
    assert "The quick brown fox" in formatted
    assert "---\n\n" in formatted
    assert "**2. [73%] lorem.pdf (page 10)**" in formatted
    assert format_search_results([]) == "No results found."


def test_mcp_session_id_issued_and_echoed(server):
    r = requests.post(
        f"{server.base}/mcp",
        json={"jsonrpc": "2.0", "id": 1, "method": "initialize",
              "params": {"protocolVersion": "2025-03-26"}},
    )
    sid = r.headers.get("Mcp-Session-Id")
    assert sid
    r2 = requests.post(
        f"{server.base}/mcp",
        json={"jsonrpc": "2.0", "id": 2, "method": "tools/list"},
        headers={"Mcp-Session-Id": sid},
    )
    assert r2.headers.get("Mcp-Session-Id") == sid


def test_supervisor_watchdog_escalates(tmp_path, monkeypatch):
    """If the worker supervisor thread dies unexpectedly, the watchdog
    escalates to a server shutdown (main.rs:183-215 equivalent)."""
    monkeypatch.setenv("RAG_TPU_WATCHDOG_INTERVAL_S", "0.2")
    srv = ServerFixture(tmp_path)
    srv.start()
    try:
        fired = threading.Event()
        srv.app["watchdog_escalate"] = fired.set
        # simulate an unexpected supervisor death: swap in a dead thread
        dead = threading.Thread(target=lambda: None)
        dead.start()
        dead.join()
        srv.sup._supervisor = dead
        assert fired.wait(5), "watchdog did not fire"
    finally:
        srv.stop()


def test_supervisor_watchdog_quiet_on_intentional_stop(tmp_path, monkeypatch):
    monkeypatch.setenv("RAG_TPU_WATCHDOG_INTERVAL_S", "0.2")
    srv = ServerFixture(tmp_path)
    srv.start()
    fired = threading.Event()
    srv.app["watchdog_escalate"] = fired.set
    srv.stop()  # intentional: sets _stopping before the thread exits
    assert not fired.wait(1), "watchdog fired on intentional stop"


def test_server_teardown_leaves_no_pending_tasks(tmp_path):
    """Shutdown must not orphan the supervisor-watchdog / job-pusher tasks:
    after app cleanup runs, zero tasks remain on the loop (the BENCH_r02
    tail showed 'Task was destroyed but it is pending!' from exactly this,
    VERDICT r3 weak #5). Exercises the full lifecycle including a search
    and a reindex so both background-task spawners are live."""
    srv = ServerFixture(tmp_path, with_reranker=False)
    srv.start()
    try:
        jr = srv.reindex_and_wait()
        assert jr["status"] == "completed"
        r = requests.post(
            f"{srv.base}/search", json={"query": "telescopes", "top_k": 3}
        )
        assert r.status_code == 200
    finally:
        srv.stop()
    assert srv.pending_after_cleanup == [], (
        f"tasks still pending after app cleanup: {srv.pending_after_cleanup}"
    )


def test_mcp_get_endpoint_405(server):
    r = requests.get(f"{server.base}/mcp")
    assert r.status_code == 405
    assert r.headers.get("Allow") == "POST"


def _init_session(server) -> str:
    r = requests.post(
        f"{server.base}/mcp",
        json={"jsonrpc": "2.0", "id": 1, "method": "initialize",
              "params": {"protocolVersion": "2025-03-26"}},
    )
    sid = r.headers.get("Mcp-Session-Id")
    assert sid
    return sid


def _broadcast(server, message: dict) -> None:
    """Publish a server-push message from the test thread (the hub's queues
    are event-loop-affine, so hop onto the server loop)."""
    hub = server.app["mcp_hub"]
    server._loop.call_soon_threadsafe(hub.broadcast, message)


def _read_sse_events(resp, want: int, timeout: float = 10.0):
    """Collect (id, data) pairs from a streaming SSE response."""
    events, eid = [], None
    deadline = time.time() + timeout
    for raw in resp.iter_lines(decode_unicode=True):
        if time.time() > deadline:
            break
        if raw.startswith("id: "):
            eid = int(raw[4:])
        elif raw.startswith("data: "):
            events.append((eid, json.loads(raw[6:])))
            if len(events) >= want:
                break
    return events


def test_mcp_sse_channel_push_and_resume(server):
    sid = _init_session(server)
    note = {"jsonrpc": "2.0", "method": "notifications/message",
            "params": {"level": "info", "data": {"n": 1}}}
    with requests.get(
        f"{server.base}/mcp",
        headers={"Accept": "text/event-stream", "Mcp-Session-Id": sid},
        stream=True, timeout=10,
    ) as r:
        assert r.status_code == 200
        assert r.headers["Content-Type"].startswith("text/event-stream")
        _broadcast(server, note)
        events = _read_sse_events(r, want=1)
    assert events and events[0][1]["params"]["data"]["n"] == 1
    first_id = events[0][0]

    # while disconnected, another event lands in the replay buffer...
    note2 = dict(note, params={"level": "info", "data": {"n": 2}})
    _broadcast(server, note2)
    time.sleep(0.2)
    # ...and reconnecting with Last-Event-ID replays exactly the missed one
    with requests.get(
        f"{server.base}/mcp",
        headers={"Accept": "text/event-stream", "Mcp-Session-Id": sid,
                 "Last-Event-ID": str(first_id)},
        stream=True, timeout=10,
    ) as r:
        events = _read_sse_events(r, want=1)
    assert events and events[0][1]["params"]["data"]["n"] == 2
    assert events[0][0] == first_id + 1


def test_mcp_sse_requires_session(server):
    r = requests.get(
        f"{server.base}/mcp", headers={"Accept": "text/event-stream"},
        timeout=5,
    )
    assert r.status_code == 400
    r = requests.get(
        f"{server.base}/mcp",
        headers={"Accept": "text/event-stream", "Mcp-Session-Id": "nope"},
        timeout=5,
    )
    assert r.status_code == 404


def test_mcp_delete_session(server):
    sid = _init_session(server)
    assert requests.delete(
        f"{server.base}/mcp", headers={"Mcp-Session-Id": sid}
    ).status_code == 200
    assert requests.delete(
        f"{server.base}/mcp", headers={"Mcp-Session-Id": sid}
    ).status_code == 404
    # a dead session is rejected on POST too (client must re-initialize)
    r = requests.post(
        f"{server.base}/mcp",
        json={"jsonrpc": "2.0", "id": 3, "method": "tools/list"},
        headers={"Mcp-Session-Id": sid},
    )
    assert r.status_code == 404


def test_mcp_sse_job_progress_push(server):
    """End-to-end server push: a reindex started while an SSE channel is
    open produces at least one job progress notification without polling."""
    sid = _init_session(server)
    with requests.get(
        f"{server.base}/mcp",
        headers={"Accept": "text/event-stream", "Mcp-Session-Id": sid},
        stream=True, timeout=30,
    ) as r:
        assert r.status_code == 200
        rr = requests.post(f"{server.base}/reindex")
        assert rr.status_code in (200, 409)
        events = _read_sse_events(r, want=1, timeout=25)
    assert events, "no job progress notification arrived"
    data = events[0][1]["params"]["data"]
    assert data["job_id"] and data["status"]
    # let the job finish so later tests see a quiet server
    for _ in range(100):
        if requests.get(f"{server.base}/jobs/active").json() is None:
            break
        time.sleep(0.2)


def test_session_hub_eviction():
    from rust_local_rag_tpu.server.sessions import McpSessionHub

    hub = McpSessionHub(max_sessions=4, idle_ttl_s=3600)
    sids = [hub.create().session_id for _ in range(4)]
    assert len(hub) == 4
    # creating past the cap evicts the oldest listener-less session
    s5 = hub.create()
    assert len(hub) == 4
    assert hub.get(sids[0]) is None  # LRU victim
    assert hub.get(s5.session_id) is not None

    # sessions with live listeners are never evicted
    hub2 = McpSessionHub(max_sessions=2, idle_ttl_s=3600)
    a = hub2.create()
    import asyncio

    loop = asyncio.new_event_loop()
    try:
        loop.run_until_complete(asyncio.sleep(0))  # loop context for Queue
        q = a.subscribe(None)
        b = hub2.create()
        c = hub2.create()  # must evict b (listener-less), not a
        assert hub2.get(a.session_id) is not None
        assert hub2.get(c.session_id) is not None
        a.unsubscribe(q)
    finally:
        loop.close()
    assert b is not None


def test_session_hub_idle_ttl(monkeypatch):
    from rust_local_rag_tpu.server import sessions as S

    hub = S.McpSessionHub(max_sessions=100, idle_ttl_s=10)
    old = hub.create()
    # age the session beyond the TTL
    old.last_seen -= 60
    fresh = hub.create()
    assert hub.get(old.session_id) is None
    assert hub.get(fresh.session_id) is not None


def test_session_eviction_over_http(tmp_path, monkeypatch):
    """Past the session cap, POST with an evicted session id returns 404
    (clients must re-initialize) while fresh sessions keep working."""
    monkeypatch.setenv("RAG_TPU_MAX_SESSIONS", "3")
    srv = ServerFixture(tmp_path, with_reranker=False)
    srv.start()
    try:
        sids = [_init_session(srv) for _ in range(5)]
        # newest still valid
        r = requests.post(
            f"{srv.base}/mcp",
            json={"jsonrpc": "2.0", "id": 2, "method": "tools/list"},
            headers={"Mcp-Session-Id": sids[-1]},
        )
        assert r.status_code == 200
        # oldest was evicted by the cap
        r = requests.post(
            f"{srv.base}/mcp",
            json={"jsonrpc": "2.0", "id": 3, "method": "tools/list"},
            headers={"Mcp-Session-Id": sids[0]},
        )
        assert r.status_code == 404
    finally:
        srv.stop()


def test_tui_watch_jobs_receives_push(server):
    """The TUI's SSE job watcher receives pushed progress for a reindex
    started over plain HTTP (no polling involved)."""
    from rust_local_rag_tpu.tui.api import ApiClient

    api = ApiClient(server.base)
    got = []
    done = threading.Event()

    def on_job(job):
        got.append(job)
        done.set()

    t = threading.Thread(
        target=lambda: api.watch_jobs(on_job, done.is_set), daemon=True
    )
    t.start()
    time.sleep(0.5)  # let the channel open
    requests.post(f"{server.base}/reindex", timeout=10)
    assert done.wait(15), "no pushed job notification reached the TUI client"
    assert got[0].job_id and got[0].status in (
        "pending", "inprogress", "completed"
    )
    # drain the job so later tests see a quiet server
    for _ in range(100):
        if requests.get(f"{server.base}/jobs/active").json() is None:
            break
        time.sleep(0.2)


def test_http_executor_sized_for_batcher_width(monkeypatch):
    """Regression: the asyncio default executor is min(32, cpus+4) threads
    — five on a single-core host — which capped concurrent blocked
    batcher.search() calls and thus every coalesced device batch at n=5
    (measured 11 qps at 128 clients). The dedicated pool must track
    RAG_TPU_BATCH_MAX (+ slack for non-search handlers)."""
    import importlib

    from rust_local_rag_tpu.server import http_api

    monkeypatch.setenv("RAG_TPU_BATCH_MAX", "256")
    monkeypatch.setattr(http_api, "_EXECUTOR", None)
    ex = http_api._executor()
    assert ex._max_workers >= 256 + 64
    # lazily cached afterwards
    assert http_api._executor() is ex
    monkeypatch.setattr(http_api, "_EXECUTOR", None)
