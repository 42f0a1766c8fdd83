"""HTTP server: JSON evaluation routes + MCP endpoint.

Route surface mirrors the reference (mcp_server.rs:573-582):
  GET  /healthz      — liveness, always 200
  GET  /readyz       — readiness: 100 ms engine read-lock probe
  POST /search       — JSON search for the eval harness
  GET  /stats        — engine stats
  POST /reindex      — start background reindex (409 when active)
  GET  /jobs/active  — active reindex job or null
  GET  /jobs/{id}    — job status
  POST {MCP_HTTP_ENDPOINT} (default /mcp) — MCP JSON-RPC
  GET  {MCP_HTTP_ENDPOINT} — per-session SSE server-push channel
       (Last-Event-ID resumption; carries reindex job progress)
  DELETE {MCP_HTTP_ENDPOINT} — terminate the MCP session

Engine calls run in a thread executor under a reader-writer lock so
searches are concurrent while ingest takes brief write locks.
"""

from __future__ import annotations

import asyncio
import concurrent.futures
import json
import logging
import math
import os
from typing import Optional

from aiohttp import web

from rust_local_rag_tpu.config import (
    MAX_TOP_K,
    QueryWeights,
    get_mcp_http_endpoint,
)
from rust_local_rag_tpu.jobs.job_manager import JobManager
from rust_local_rag_tpu.jobs.worker import JobRequest, WorkerSupervisor
from rust_local_rag_tpu.server.batcher import SearchBatcher
from rust_local_rag_tpu.server.mcp import McpHandler
from rust_local_rag_tpu.server.sessions import McpSessionHub, job_notification
from rust_local_rag_tpu.utils.rwlock import RwLock

logger = logging.getLogger(__name__)


class AppContext:
    """Shared state for HTTP handlers + the MCP tool dispatcher
    (mcp_server.rs:399-406 AppState equivalent)."""

    def __init__(
        self,
        engine,
        engine_lock: RwLock,
        job_manager: JobManager,
        supervisor: WorkerSupervisor,
        documents_dir: str,
    ):
        self.engine = engine
        self.engine_lock = engine_lock
        self.job_manager = job_manager
        self.supervisor = supervisor
        self.documents_dir = documents_dir
        # coalesces concurrent searches into one device pass
        self.batcher = SearchBatcher(engine, engine_lock)
        # set by build_app: threadsafe callback fired when a job starts,
        # drives SSE job progress push (sessions.py)
        self.on_job_started = None

    # --- sync operations (called inside an executor) ---

    def search(
        self,
        query,
        top_k,
        diversity,
        weights: Optional[QueryWeights],
        rejection_threshold: Optional[float] = None,
        use_reranker: bool = True,
        rejection_cosine_floor: Optional[float] = None,
        rejection_query_floor: Optional[float] = None,
        rejection_unseen_mass: Optional[float] = None,
        rejection_unseen_cos: Optional[float] = None,
        rejection_unseen_judge: Optional[float] = None,
    ):
        return self.batcher.search(
            query,
            top_k,
            diversity,
            weights,
            rejection_threshold=rejection_threshold,
            use_reranker=use_reranker,
            rejection_cosine_floor=rejection_cosine_floor,
            rejection_query_floor=rejection_query_floor,
            rejection_unseen_mass=rejection_unseen_mass,
            rejection_unseen_cos=rejection_unseen_cos,
            rejection_unseen_judge=rejection_unseen_judge,
        )

    def list_documents(self):
        with self.engine_lock.read():
            return self.engine.list_documents()

    def get_stats(self):
        with self.engine_lock.read():
            return self.engine.get_stats()

    def start_reindex(self):
        """Atomic create-if-not-active + enqueue (mcp_server.rs:148-189)."""
        job = self.job_manager.create_reindex_job_if_not_active(
            self.documents_dir, 0
        )
        if job is None:
            return None
        self.supervisor.submit(JobRequest(job.job_id, self.documents_dir))
        if self.on_job_started is not None:
            try:
                self.on_job_started(job.job_id)
            except Exception:  # noqa: BLE001
                logger.debug("on_job_started hook failed", exc_info=True)
        return job

    def get_job(self, job_id: str):
        return self.job_manager.get_job(job_id)

    def find_active_job(self):
        return self.job_manager.find_active_reindex_job()

    def has_reranker(self) -> bool:
        with self.engine_lock.read():
            return self.engine.has_reranker()

    def get_embedding_candidates(self, query: str, count: int):
        with self.engine_lock.read():
            return self.engine.get_embedding_candidates(query, count)

    def calibrate(self, query, candidates, sample_size):
        with self.engine_lock.read():
            return self.engine.get_reranker().calibrate_timeout(
                query, candidates, sample_size
            )

    def readyz_probe(self) -> bool:
        """100 ms read-lock probe (mcp_server.rs:328-343)."""
        if self.engine_lock.acquire_read(timeout=0.1):
            self.engine_lock.release_read()
            return True
        return False


# Dedicated pool for blocking handler work. The asyncio default executor
# sizes itself min(32, cpus + 4) — on a 1-core host that is FIVE threads,
# which silently caps the number of requests that can sit blocked in
# batcher.search() and therefore caps every coalesced device batch at 5
# (measured: 128 concurrent clients -> n=5 batches -> 11 qps). Search
# threads spend their life waiting on a Future, not on the CPU, so the
# pool is sized for the batcher's max coalesce width plus slack.
_EXECUTOR: Optional[concurrent.futures.ThreadPoolExecutor] = None
_EXECUTOR_LOCK = __import__("threading").Lock()


def _executor() -> concurrent.futures.ThreadPoolExecutor:
    # created lazily so RAG_TPU_BATCH_MAX set after import (launchers,
    # benches) still sizes the pool
    global _EXECUTOR
    if _EXECUTOR is None:
        with _EXECUTOR_LOCK:
            if _EXECUTOR is None:
                _EXECUTOR = concurrent.futures.ThreadPoolExecutor(
                    max_workers=(
                        int(os.environ.get("RAG_TPU_BATCH_MAX", "16")) + 64
                    ),
                    thread_name_prefix="http-worker",
                )
    return _EXECUTOR


async def _in_executor(fn, *args):
    loop = asyncio.get_running_loop()
    return await loop.run_in_executor(_executor(), fn, *args)


def parse_search_params(body: dict):
    """Validate a /search JSON body. Returns (params, None) on success or
    (None, error_text) for a 400 — shared by the aiohttp handler and the
    fast-path protocol (fastpath.py) so both answer identically."""
    query = body.get("query", "")
    try:
        top_k = min(int(body.get("top_k", 5)), MAX_TOP_K)
        diversity = float(body.get("diversity_factor", 0.3))
    except (TypeError, ValueError):
        return None, "invalid top_k/diversity_factor"
    # json.loads accepts the NaN/Infinity literals, and NaN slides
    # through a min/max clamp unchanged — reject like the MCP path
    if not math.isfinite(diversity):
        return None, "invalid top_k/diversity_factor"
    diversity = min(max(diversity, 0.0), 1.0)
    weights = (
        QueryWeights.from_dict(body["weights"])
        if isinstance(body.get("weights"), dict)
        else None
    )
    # engine-level rejection + reranker toggle (framework extensions
    # beyond the reference's API; defaults preserve reference behavior)
    try:
        rejection = body.get("rejection_threshold")
        rejection = None if rejection is None else float(rejection)
    except (TypeError, ValueError):
        return None, "invalid rejection_threshold"
    if rejection is not None and not math.isfinite(rejection):
        return None, "invalid rejection_threshold"
    use_reranker = body.get("use_reranker", True)
    if not isinstance(use_reranker, bool):
        return None, "invalid use_reranker"
    try:
        cos_floor = body.get("rejection_cosine_floor")
        cos_floor = None if cos_floor is None else float(cos_floor)
    except (TypeError, ValueError):
        return None, "invalid rejection_cosine_floor"
    if cos_floor is not None and not math.isfinite(cos_floor):
        return None, "invalid rejection_cosine_floor"
    try:
        q_floor = body.get("rejection_query_floor")
        q_floor = None if q_floor is None else float(q_floor)
    except (TypeError, ValueError):
        return None, "invalid rejection_query_floor"
    if q_floor is not None and not math.isfinite(q_floor):
        return None, "invalid rejection_query_floor"
    try:
        um_mass = body.get("rejection_unseen_mass")
        um_mass = None if um_mass is None else float(um_mass)
    except (TypeError, ValueError):
        return None, "invalid rejection_unseen_mass"
    if um_mass is not None and not math.isfinite(um_mass):
        return None, "invalid rejection_unseen_mass"
    try:
        um_cos = body.get("rejection_unseen_cos")
        um_cos = None if um_cos is None else float(um_cos)
    except (TypeError, ValueError):
        return None, "invalid rejection_unseen_cos"
    if um_cos is not None and not math.isfinite(um_cos):
        return None, "invalid rejection_unseen_cos"
    try:
        um_judge = body.get("rejection_unseen_judge")
        um_judge = None if um_judge is None else float(um_judge)
    except (TypeError, ValueError):
        return None, "invalid rejection_unseen_judge"
    if um_judge is not None and not math.isfinite(um_judge):
        return None, "invalid rejection_unseen_judge"
    return {
        "query": query,
        "top_k": top_k,
        "diversity": diversity,
        "weights": weights,
        "rejection_threshold": rejection,
        "use_reranker": use_reranker,
        "rejection_cosine_floor": cos_floor,
        "rejection_query_floor": q_floor,
        "rejection_unseen_mass": um_mass,
        "rejection_unseen_cos": um_cos,
        "rejection_unseen_judge": um_judge,
    }, None


def build_app(ctx: AppContext) -> web.Application:
    app = web.Application(client_max_size=64 * 1024 * 1024)
    mcp = McpHandler(ctx)
    hub = McpSessionHub()

    async def healthz(request: web.Request) -> web.Response:
        return web.Response(status=200)

    async def readyz(request: web.Request) -> web.Response:
        ok = await _in_executor(ctx.readyz_probe)
        return web.Response(status=200 if ok else 503)

    async def http_search(request: web.Request) -> web.Response:
        try:
            body = await request.json()
        except json.JSONDecodeError:
            return web.Response(status=400, text="invalid JSON")
        params, err = parse_search_params(body)
        if err is not None:
            return web.Response(status=400, text=err)
        try:
            # enqueue straight into the batcher and await a loop-native
            # future — no executor-thread hop, and the batcher resolves a
            # whole batch of these with ONE call_soon_threadsafe (the
            # per-request wrap_future wakeup was a self-pipe syscall each).
            # The rerank-off hot lane resolves to READY RESPONSE BYTES from
            # the native serializer; other lanes to SearchResult objects.
            loop = asyncio.get_running_loop()
            fut = loop.create_future()
            ctx.batcher.submit(
                params["query"], params["top_k"], params["diversity"],
                params["weights"],
                rejection_threshold=params["rejection_threshold"],
                use_reranker=params["use_reranker"],
                want_payload=True,
                rejection_cosine_floor=params["rejection_cosine_floor"],
                rejection_query_floor=params["rejection_query_floor"],
                rejection_unseen_mass=params["rejection_unseen_mass"],
                rejection_unseen_cos=params["rejection_unseen_cos"],
                rejection_unseen_judge=params["rejection_unseen_judge"],
                afuture=fut,
                loop=loop,
            )
            res = await fut
        except Exception as e:  # noqa: BLE001
            logger.error("Search error: %s", e)
            return web.Response(status=500)
        if isinstance(res, (bytes, bytearray)):
            return web.Response(body=res, content_type="application/json")
        return web.json_response({"results": [r.to_dict() for r in res]})

    async def http_stats(request: web.Request) -> web.Response:
        stats = await _in_executor(ctx.get_stats)
        return web.json_response(stats)

    async def http_reindex(request: web.Request) -> web.Response:
        try:
            job = await _in_executor(ctx.start_reindex)
        except Exception as e:  # noqa: BLE001
            logger.error("Failed to create reindex job: %s", e)
            return web.Response(status=500, text=f"Failed to create job: {e}")
        if job is None:
            return web.Response(
                status=409, text="A reindex job is already in progress"
            )
        return web.json_response(
            {"job_id": job.job_id, "message": "Reindexing started"}
        )

    async def http_job_status(request: web.Request) -> web.Response:
        job_id = request.match_info["job_id"]
        job = await _in_executor(ctx.get_job, job_id)
        if job is None:
            return web.Response(status=404, text=f"Job {job_id} not found")
        return web.json_response(
            {
                "job_id": job.job_id,
                "status": job.status.value,
                "progress": job.progress,
                "total": job.total,
                "error": job.error,
            }
        )

    async def http_active_job(request: web.Request) -> web.Response:
        job = await _in_executor(ctx.find_active_job)
        if job is None:
            return web.json_response(None)
        return web.json_response(
            {
                "job_id": job.job_id,
                "status": job.status.value,
                "progress": job.progress,
                "total": job.total,
                "error": job.error,
            }
        )

    async def mcp_endpoint(request: web.Request) -> web.Response:
        try:
            payload = await request.json()
        except json.JSONDecodeError:
            return web.json_response(
                {
                    "jsonrpc": "2.0",
                    "id": None,
                    "error": {"code": -32700, "message": "Parse error"},
                },
                status=400,
            )
        if not isinstance(payload, dict):
            # JSON-RPC batch arrays and other non-object payloads are not
            # supported; reply Invalid Request instead of crashing to 500
            return web.json_response(
                {
                    "jsonrpc": "2.0",
                    "id": None,
                    "error": {"code": -32600, "message": "Invalid Request"},
                },
                status=400,
            )
        # streamable-HTTP session management (rmcp StreamableHttpService
        # equivalent, mcp_server.rs:546-563): a session is created on
        # `initialize`; later requests echo the id. A presented-but-unknown
        # id gets 404 so spec-following clients re-initialize; requests
        # with NO id are served statelessly (the tools need no session).
        headers = {}
        sid = request.headers.get("Mcp-Session-Id")
        if sid is not None and hub.get(sid) is None and not (
            isinstance(payload, dict) and payload.get("method") == "initialize"
        ):
            return web.Response(status=404)
        response = await _in_executor(mcp.handle, payload)
        if isinstance(payload, dict) and payload.get("method") == "initialize":
            headers["Mcp-Session-Id"] = hub.create().session_id
        elif sid is not None:
            headers["Mcp-Session-Id"] = sid
        if response is None:  # notification
            return web.Response(status=202, headers=headers)
        accept = request.headers.get("Accept", "")
        if "text/event-stream" in accept and "application/json" not in accept:
            body = f"event: message\ndata: {json.dumps(response)}\n\n"
            return web.Response(
                status=200,
                body=body.encode(),
                content_type="text/event-stream",
                headers=headers,
            )
        return web.json_response(response, headers=headers)

    app.router.add_get("/healthz", healthz)
    app.router.add_get("/readyz", readyz)
    app.router.add_post("/search", http_search)
    app.router.add_get("/stats", http_stats)
    app.router.add_post("/reindex", http_reindex)
    app.router.add_get("/jobs/active", http_active_job)
    app.router.add_get("/jobs/{job_id}", http_job_status)
    async def mcp_get(request: web.Request) -> web.StreamResponse:
        """Persistent server-push SSE channel for a session (streamable-HTTP
        GET). Supports Last-Event-ID resumption from the per-session replay
        buffer; carries reindex job progress notifications."""
        if "text/event-stream" not in request.headers.get("Accept", ""):
            return web.Response(status=405, headers={"Allow": "POST"})
        sid = request.headers.get("Mcp-Session-Id")
        if not sid:
            return web.Response(status=400, text="Mcp-Session-Id required")
        session = hub.get(sid)
        if session is None:
            return web.Response(status=404)
        last_id = None
        raw = request.headers.get("Last-Event-ID")
        if raw is not None:
            try:
                last_id = int(raw)
            except ValueError:
                last_id = None
        resp = web.StreamResponse(
            status=200,
            headers={
                "Content-Type": "text/event-stream",
                "Cache-Control": "no-store",
                "Mcp-Session-Id": sid,
            },
        )
        await resp.prepare(request)
        q = session.subscribe(last_id)
        try:
            while True:
                try:
                    item = await asyncio.wait_for(q.get(), timeout=15)
                except asyncio.TimeoutError:
                    await resp.write(b": keep-alive\n\n")
                    continue
                if item is None:  # session terminated (DELETE)
                    break
                eid, data = item
                await resp.write(
                    f"id: {eid}\nevent: message\ndata: {data}\n\n".encode()
                )
        except (ConnectionResetError, asyncio.CancelledError):
            pass
        finally:
            session.unsubscribe(q)
        return resp

    async def mcp_delete(request: web.Request) -> web.Response:
        sid = request.headers.get("Mcp-Session-Id")
        if not sid:
            return web.Response(status=400, text="Mcp-Session-Id required")
        return web.Response(status=200 if hub.drop(sid) else 404)

    async def _watch_job(job_id: str) -> None:
        """Poll one job until terminal, broadcasting every status/progress
        change as an MCP notification over the session SSE channels
        (server-push replaces the reference's poll-only get_job_status).
        Broadcasts land in each session's replay buffer, so even a client
        that reconnects later sees the transitions (Last-Event-ID)."""
        last = None
        while True:
            try:
                job = await _in_executor(ctx.get_job, job_id)
            except Exception:  # noqa: BLE001
                logger.debug("job progress fetch failed", exc_info=True)
                return
            if job is None:
                return
            snap = (job.status.value, job.progress, job.total)
            if snap != last:
                hub.broadcast(job_notification(job))
                last = snap
            if job.status.value in ("completed", "failed"):
                return
            await asyncio.sleep(0.4)

    async def _job_progress_pusher(app: web.Application):
        """Install the threadsafe job-started hook (jobs start inside
        executor threads) and reap watcher tasks on shutdown."""
        loop = asyncio.get_running_loop()
        tasks: set = set()

        def on_started(job_id: str) -> None:
            def spawn() -> None:
                t = loop.create_task(_watch_job(job_id))
                tasks.add(t)
                t.add_done_callback(tasks.discard)

            loop.call_soon_threadsafe(spawn)

        ctx.on_job_started = on_started
        yield
        ctx.on_job_started = None
        for t in list(tasks):
            t.cancel()
        await asyncio.gather(*tasks, return_exceptions=True)

    async def _supervisor_watchdog(app: web.Application):
        """If the worker-supervisor thread dies unexpectedly, escalate to a
        server shutdown rather than serving with a dead ingest pipeline
        (main.rs:183-215 watchdog equivalent). The escalation raises
        SIGTERM against this process, which aiohttp turns into the normal
        graceful-shutdown path (flush + save)."""
        import os as _os2
        import signal as _signal

        interval = float(
            _os2.environ.get("RAG_TPU_WATCHDOG_INTERVAL_S", "5")
        )

        def default_escalate() -> None:
            _os2.kill(_os2.getpid(), _signal.SIGTERM)

        app.setdefault("watchdog_escalate", default_escalate)

        async def watch() -> None:
            while True:
                await asyncio.sleep(interval)
                sup = ctx.supervisor
                if sup is not None and not sup.is_healthy():
                    logger.critical(
                        "Worker supervisor died unexpectedly; "
                        "shutting down server"
                    )
                    app["watchdog_escalate"]()
                    return

        task = asyncio.create_task(watch())
        yield
        task.cancel()
        try:
            await task
        except asyncio.CancelledError:
            pass

    endpoint = get_mcp_http_endpoint()
    app.router.add_post(endpoint, mcp_endpoint)
    app.router.add_get(endpoint, mcp_get)
    app.router.add_delete(endpoint, mcp_delete)
    app.cleanup_ctx.append(_job_progress_pusher)
    app.cleanup_ctx.append(_supervisor_watchdog)
    app["mcp_hub"] = hub
    return app
