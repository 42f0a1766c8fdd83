"""Process entry / bootstrap.

Equivalent of the reference's main() (main.rs:140-242): env config, logging
init (JSON file layer + optional console), data/documents dir creation, log
auto-truncation task, engine construction (fail-fast on encoder verification
like the reference exits non-zero when Ollama is unreachable), job system
wiring, HTTP+MCP serve, and a graceful-shutdown flush with a 10 s lock
timeout and 5 s save timeout.
"""

from __future__ import annotations

import json
import logging
import logging.handlers
import os
import sys
import threading
import time
from typing import Optional

from rust_local_rag_tpu import config
from rust_local_rag_tpu.utils.rwlock import RwLock

logger = logging.getLogger(__name__)


class JsonFormatter(logging.Formatter):
    """Structured JSON log lines (reference uses tracing-subscriber's JSON
    layer, main.rs:80-82)."""

    def format(self, record: logging.LogRecord) -> str:
        entry = {
            "timestamp": self.formatTime(record),
            "level": record.levelname,
            "target": record.name,
            "message": record.getMessage(),
        }
        if record.exc_info:
            entry["exception"] = self.formatException(record.exc_info)
        return json.dumps(entry, ensure_ascii=False)


def setup_logging() -> None:
    """main.rs:60-112: file JSON layer always on; console layer in dev."""
    log_dir = config.get_log_dir()
    os.makedirs(log_dir, exist_ok=True)
    level = getattr(logging, config.get_log_level().upper(), logging.INFO)

    root = logging.getLogger()
    root.setLevel(level)

    log_file = os.path.join(log_dir, "rust-local-rag-tpu.log")
    fh = logging.FileHandler(log_file)
    fh.setFormatter(JsonFormatter())
    root.addHandler(fh)

    is_dev = (
        os.environ.get("DEVELOPMENT") is not None
        or os.environ.get("DEV") is not None
        or os.environ.get("CONSOLE_LOGS") is not None
    )
    if is_dev:
        ch = logging.StreamHandler(sys.stdout)
        ch.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s %(message)s")
        )
        root.addHandler(ch)
        logger.info("Development mode: logging to console AND file")

    logger.info("Logging initialized")
    logger.info("Log directory: %s", log_dir)


def start_log_cleanup_task(stop_event: threading.Event) -> threading.Thread:
    """Size-capped auto-truncation, 5-minute interval (main.rs:114-138)."""
    log_dir = config.get_log_dir()
    max_bytes = config.get_log_max_mb() * 1024 * 1024
    log_file = os.path.join(log_dir, "rust-local-rag-tpu.log")

    def loop() -> None:
        while not stop_event.wait(300):
            try:
                if os.path.getsize(log_file) > max_bytes:
                    with open(log_file, "w", encoding="utf-8") as f:
                        f.write(
                            f"[LOG TRUNCATED - Size exceeded "
                            f"{config.get_log_max_mb()}MB]\n"
                        )
            except OSError:
                pass

    t = threading.Thread(target=loop, name="log-cleanup", daemon=True)
    t.start()
    return t


def enable_compilation_cache(data_dir: str) -> None:
    """Persist XLA compilations across restarts. TPU compiles through a
    tunnel can take minutes; the on-disk cache makes warmup a one-time
    cost per shape."""
    try:
        import jax

        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", os.path.join(data_dir, ".jax_cache")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        logger.info("JAX compilation cache at %s", cache_dir)
    except Exception as e:  # noqa: BLE001
        logger.warning("Could not enable compilation cache: %s", e)


def warmup_device_roundtrip() -> None:
    """Absorb the tunnel's first host->device->host transfer before
    serving. The FIRST device fetch in a process through the axon tunnel
    is erratically slow (measured 2.7 s / 31 s / 80 s / 200 s / >15 min
    for the same tiny fetch across runs); every later fetch is
    milliseconds. Paying it here — before the server binds — keeps
    ingest persistence and first-query latency deterministic. Pure
    transfer, no XLA program, so nothing to compile."""
    try:
        import time as _time

        import jax
        import numpy as _np

        t0 = _time.monotonic()
        x = jax.device_put(_np.ones((8,), _np.float32))
        _np.asarray(x)
        logger.info(
            "Device round-trip warmup in %.1f s", _time.monotonic() - t0
        )
    except Exception as e:  # noqa: BLE001 — serving works without it
        logger.warning("Device round-trip warmup failed: %s", e)


def build_runtime(data_dir: Optional[str] = None, documents_dir: Optional[str] = None):
    """Construct engine + lock + jobs + supervisor + app context."""
    from rust_local_rag_tpu.engine.rag_engine import RagEngine
    from rust_local_rag_tpu.jobs.job_manager import JobManager
    from rust_local_rag_tpu.jobs.worker import WorkerSupervisor
    from rust_local_rag_tpu.server.http_api import AppContext

    data_dir = data_dir or config.get_data_dir()
    documents_dir = documents_dir or config.get_documents_dir()
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(documents_dir, exist_ok=True)
    enable_compilation_cache(data_dir)
    warmup_device_roundtrip()

    engine = RagEngine.create(data_dir)
    if engine.needs_reindex():
        logger.warning(
            "Embedding model changed to '%s'. Existing embeddings were "
            "cleared and a full reindex will be available via the "
            "start_reindex tool.",
            engine.embedding_model(),
        )
    engine_lock = RwLock()

    job_db = os.path.join(data_dir, "jobs.db")
    job_manager = JobManager(job_db)
    logger.info("Job manager initialized with database at %s", job_db)

    supervisor = WorkerSupervisor(
        job_manager, engine, engine_lock, log_dir=config.get_log_dir()
    )
    ctx = AppContext(engine, engine_lock, job_manager, supervisor, documents_dir)
    return ctx


def graceful_flush(ctx) -> None:
    """Shutdown flush: 10 s lock timeout, 5 s save budget (main.rs:217-241)."""
    logger.info("Initiating graceful shutdown...")
    logger.info("Acquiring lock for flush (10s timeout)...")
    if not ctx.engine_lock.acquire_write(timeout=10.0):
        logger.error("Could not acquire lock within 10s. Exiting without save.")
        return
    try:
        logger.info("Lock acquired. Flushing state to disk (5s timeout)...")
        done = threading.Event()
        err: list = []

        def save() -> None:
            try:
                ctx.engine.save_to_disk()
            except Exception as e:  # noqa: BLE001
                err.append(e)
            finally:
                done.set()

        t = threading.Thread(target=save, daemon=True)
        t.start()
        if not done.wait(5.0):
            logger.error("Save operation timed out after 5s")
        elif err:
            logger.error("Failed to save state: %s", err[0])
        else:
            logger.info("RAG state successfully saved to disk")
    finally:
        ctx.engine_lock.release_write()


def main(argv: Optional[list] = None) -> int:
    # .env support (main.rs:142)
    _load_dotenv()
    # RAG_TPU_PLATFORM=cpu forces the CPU backend (smoke deployments, CI,
    # or when the TPU is reserved by a training job). Must happen before
    # the first computation; some PJRT plugins ignore the JAX_PLATFORMS
    # env var, so this goes through the config API.
    platform = os.environ.get("RAG_TPU_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    setup_logging()

    stop_event = threading.Event()
    start_log_cleanup_task(stop_event)
    logger.info(
        "Started automatic log cleanup task (max: %dMB)", config.get_log_max_mb()
    )

    try:
        ctx = build_runtime()
    except Exception as e:  # noqa: BLE001 — fail fast, non-zero exit
        logger.error("Startup failed: %s", e)
        print(f"Startup failed: {e}", file=sys.stderr)
        return 1

    ctx.supervisor.start()
    logger.info("Worker supervisor started")

    # Profiling hook (SURVEY §5.1 TPU equivalent of the reference's tracing
    # layer): RAG_TPU_PROFILE_PORT starts the JAX profiler server, so
    # TensorBoard / xprof can capture device traces from a live server.
    profile_port = os.environ.get("RAG_TPU_PROFILE_PORT")
    if profile_port:
        try:
            import jax

            jax.profiler.start_server(int(profile_port))
            logger.info("JAX profiler server on port %s", profile_port)
        except Exception as e:  # noqa: BLE001
            logger.warning("Profiler server failed to start: %s", e)
    ctx.engine.warmup()  # pre-compile search programs (non-fatal)
    try:
        n = ctx.batcher.preregister_fragments()
        if n:
            logger.info("Preregistered %d response fragments", n)
    except Exception as e:  # noqa: BLE001 — serving works without it
        logger.warning("Fragment preregistration failed: %s", e)
    logger.info("Data directory: %s", config.get_data_dir())
    logger.info("Documents directory: %s", config.get_documents_dir())
    logger.info("Embedding model: %s", ctx.engine.embedding_model())
    logger.info("Use start_reindex tool to begin document indexing")

    from aiohttp import web

    from rust_local_rag_tpu.server.http_api import build_app

    bind = config.get_mcp_http_bind()
    host, _, port = bind.rpartition(":")
    app = build_app(ctx)
    logger.info(
        "Starting MCP streamable HTTP server on http://%s%s",
        bind,
        config.get_mcp_http_endpoint(),
    )
    logger.info(
        "HTTP evaluation endpoints: POST /search, GET /stats, POST /reindex, "
        "GET /jobs/active, GET /jobs/:id"
    )

    try:
        if os.environ.get("RAG_TPU_HTTP_FASTPATH", "1") != "0":
            # POST /search served by the hand-rolled protocol, all other
            # routes by aiohttp on the same socket (server/fastpath.py)
            from rust_local_rag_tpu.server.fastpath import serve

            serve(app, ctx, host or "127.0.0.1", int(port))
        else:
            web.run_app(
                app, host=host or "127.0.0.1", port=int(port), print=None
            )
    except KeyboardInterrupt:
        pass
    finally:
        stop_event.set()
        ctx.supervisor.stop()
        graceful_flush(ctx)
        logger.info("MCP server shut down gracefully")
    return 0


def _load_dotenv(path: str = ".env") -> None:
    """Minimal dotenv: KEY=VALUE lines, # comments, no overrides."""
    try:
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#") or "=" not in line:
                    continue
                key, _, val = line.partition("=")
                key, val = key.strip(), val.strip().strip("\"'")
                if key and key not in os.environ:
                    os.environ[key] = val
    except OSError:
        pass


if __name__ == "__main__":
    sys.exit(main())
