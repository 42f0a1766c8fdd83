"""HTTP fast-path protocol tests (server/fastpath.py): the hand-rolled
POST /search lane and its delegation contract with aiohttp.

The module-scoped `server` fixture in test_server.py already serves
through FastPathProtocol, so every test there covers routing parity;
these tests drive the raw-socket behaviors requests/aiohttp clients
never produce — pipelining, mixed connections, split writes.
"""

from __future__ import annotations

import json
import socket

import pytest
import requests

from test_server import ServerFixture  # noqa: F401 (fixture machinery)


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    f = ServerFixture(tmp_path_factory.mktemp("fastpath"))
    f.start()
    jr = f.reindex_and_wait()
    assert jr["status"] == "completed"
    yield f
    f.stop()


def _send_raw(port: int, payload: bytes, n_responses: int = 1,
              timeout: float = 30.0) -> list:
    """Write raw bytes to the server, read n HTTP responses, return
    [(status, headers_bytes, body_bytes)]."""
    s = socket.create_connection(("127.0.0.1", port), timeout=timeout)
    try:
        s.sendall(payload)
        buf = b""
        out = []
        while len(out) < n_responses:
            he = buf.find(b"\r\n\r\n")
            while he < 0:
                chunk = s.recv(65536)
                if not chunk:
                    raise AssertionError(
                        f"connection closed after {len(out)} responses; "
                        f"buffer={buf[:200]!r}"
                    )
                buf += chunk
                he = buf.find(b"\r\n\r\n")
            head = buf[:he]
            low = head.lower()
            j = low.find(b"content-length:")
            assert j >= 0, head
            eol = low.find(b"\r", j)
            cl = int(low[j + 15 : eol if eol > 0 else len(low)])
            while len(buf) < he + 4 + cl:
                buf += s.recv(65536)
            status = int(head.split()[1])
            out.append((status, head, buf[he + 4 : he + 4 + cl]))
            buf = buf[he + 4 + cl :]
        return out
    finally:
        s.close()


def _search_req(query: str, top_k: int = 3, **extra) -> bytes:
    body = json.dumps({"query": query, "top_k": top_k, **extra}).encode()
    return (
        b"POST /search HTTP/1.1\r\nHost: t\r\n"
        b"Content-Type: application/json\r\nContent-Length: "
        + str(len(body)).encode()
        + b"\r\n\r\n"
        + body
    )


def test_fast_search_matches_requests_client(fx):
    """The raw fast path and a requests (aiohttp-delegated keep-alive)
    POST produce byte-identical result lists."""
    ((status, _, body),) = _send_raw(
        fx.port, _search_req("zephyr turbine maintenance")
    )
    assert status == 200
    fast = json.loads(body)
    assert fast["results"], "fast path returned no results"
    r = requests.post(
        f"{fx.base}/search",
        json={"query": "zephyr turbine maintenance", "top_k": 3},
        timeout=30,
    )
    assert r.status_code == 200
    assert r.json() == fast


def test_fast_400s_match_aiohttp_texts(fx):
    cases = [
        (b"{broken", b"invalid JSON"),
        (json.dumps({"query": "x", "top_k": "three"}).encode(),
         b"invalid top_k/diversity_factor"),
        (json.dumps({"query": "x", "diversity_factor": float("nan")}
                    ).replace("NaN", "NaN").encode(),
         b"invalid top_k/diversity_factor"),
        (json.dumps({"query": "x", "use_reranker": 1}).encode(),
         b"invalid use_reranker"),
        (json.dumps({"query": "x", "rejection_threshold": "hi"}).encode(),
         b"invalid rejection_threshold"),
    ]
    for body, want in cases:
        req = (
            b"POST /search HTTP/1.1\r\nHost: t\r\nContent-Length: "
            + str(len(body)).encode() + b"\r\n\r\n" + body
        )
        ((status, _, got),) = _send_raw(fx.port, req)
        assert status == 400, (body, status, got)
        assert got == want, (body, got, want)


def test_pipelined_requests_answered_in_order(fx):
    """Three back-to-back requests on one socket (no reads in between)
    come back in request order — top_k distinguishes them."""
    payload = (
        _search_req("turbine", top_k=1)
        + _search_req("coral reef", top_k=2)
        + _search_req("turbine", top_k=3)
    )
    resps = _send_raw(fx.port, payload, n_responses=3)
    ks = [len(json.loads(b)["results"]) for _, _, b in resps]
    assert all(s == 200 for s, _, _ in resps)
    # results are capped by matches, but ordering holds: k=1 first
    assert ks[0] == 1 and ks[1] >= 1 and ks[2] >= ks[0]


def test_split_byte_delivery(fx):
    """Headers and body arriving in separate TCP segments parse fine."""
    req = _search_req("zephyr turbine")
    s = socket.create_connection(("127.0.0.1", fx.port), timeout=30)
    try:
        cut = req.find(b"\r\n\r\n") + 2  # mid-header-terminator split
        s.sendall(req[:cut])
        import time

        time.sleep(0.05)
        s.sendall(req[cut:])
        buf = b""
        while b"\r\n\r\n" not in buf:
            buf += s.recv(65536)
        assert buf.startswith(b"HTTP/1.1 200")
    finally:
        s.close()


def test_mixed_connection_delegates_to_aiohttp(fx):
    """search (fast) then stats (delegated) then search again (aiohttp
    from then on) — one keep-alive socket, three correct responses."""
    stats_req = b"GET /stats HTTP/1.1\r\nHost: t\r\n\r\n"
    resps = _send_raw(
        fx.port,
        _search_req("turbine", top_k=2) + stats_req
        + _search_req("coral", top_k=2),
        n_responses=3,
    )
    assert [s for s, _, _ in resps] == [200, 200, 200]
    assert "chunks" in json.loads(resps[1][2])
    assert "results" in json.loads(resps[2][2])


def test_non_search_routes_still_served(fx):
    """Fresh connections to aiohttp-owned routes work (delegation on
    byte 0)."""
    assert requests.get(f"{fx.base}/healthz", timeout=10).status_code == 200
    r = requests.get(f"{fx.base}/stats", timeout=10)
    assert r.status_code == 200 and "documents" in r.json()
    # MCP post (aiohttp lane)
    r = requests.post(
        f"{fx.base}/mcp",
        json={"jsonrpc": "2.0", "id": 1, "method": "tools/list"},
        timeout=30,
    )
    assert "tools" in r.json()["result"]


def test_connection_close_honored(fx):
    body = json.dumps({"query": "turbine", "top_k": 1}).encode()
    req = (
        b"POST /search HTTP/1.1\r\nHost: t\r\nConnection: close\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )
    s = socket.create_connection(("127.0.0.1", fx.port), timeout=30)
    try:
        s.sendall(req)
        buf = b""
        while True:
            chunk = s.recv(65536)
            if not chunk:
                break
            buf += chunk
        assert buf.startswith(b"HTTP/1.1 200")
    finally:
        s.close()


def test_chunked_body_delegates(fx):
    """Transfer-Encoding: chunked goes to aiohttp (which handles it)."""
    body = json.dumps({"query": "turbine", "top_k": 1}).encode()
    req = (
        b"POST /search HTTP/1.1\r\nHost: t\r\n"
        b"Content-Type: application/json\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n"
        + hex(len(body))[2:].encode() + b"\r\n" + body + b"\r\n0\r\n\r\n"
    )
    ((status, _, got),) = _send_raw(fx.port, req)
    assert status == 200
    assert "results" in json.loads(got)


def test_search_with_query_string_delegates(fx):
    """`POST /search?x=1` is not the literal hot route — aiohttp routing
    must answer it (404 from aiohttp's router is acceptable only if the
    route doesn't match; aiohttp treats the query string fine, so 200)."""
    body = json.dumps({"query": "turbine", "top_k": 1}).encode()
    req = (
        b"POST /search?x=1 HTTP/1.1\r\nHost: t\r\nContent-Length: "
        + str(len(body)).encode() + b"\r\n\r\n" + body
    )
    ((status, _, got),) = _send_raw(fx.port, req)
    assert status == 200
    assert "results" in json.loads(got)
