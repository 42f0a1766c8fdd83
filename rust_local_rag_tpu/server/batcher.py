"""Search micro-batcher: coalesce concurrent requests into one device pass,
and PIPELINE consecutive batches so the device tunnel round trip is hidden.

Each device dispatch through a TPU runtime has fixed overhead (on the axon
tunnel, ~50 ms per RPC), and the fused first-stage program is nearly as
cheap for 16 queries as for 1. The batcher groups concurrent /search
requests that share identical parameters (top_k, diversity, weights) inside
a small window and executes them as ONE engine pass under a single read
lock.

Round-3 serving upgrades:
  * submit() returns a concurrent Future directly — the aiohttp handler
    awaits it via asyncio.wrap_future with NO executor-thread hop (on the
    single-core host every thread handoff is measurable GIL churn).
  * batches execute on a small pool (depth 2): while batch N's device
    work + result fetch is in flight, batch N+1 already dispatches — the
    rerank-off hot lane splits engine work into dispatch_search (async
    device call) + fetch_columnar (blocking fetch), so consecutive batches
    overlap the ~50 ms tunnel RTT with real compute.
  * hot-lane requests from the HTTP route ask for the SERIALIZED response
    body (want_payload): results go numpy -> native C++ serializer ->
    bytes, never materializing per-result Python objects.

Single requests under no concurrency pay at most `window_ms` extra latency
(default 3 ms); a burst of Q concurrent requests collapses from Q device
dispatches into one.
"""

from __future__ import annotations

import logging
import os
import queue
import threading
import time as _time
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from rust_local_rag_tpu.config import QueryWeights

logger = logging.getLogger(__name__)


def _weights_key(w: Optional[QueryWeights]) -> Tuple:
    if w is None:
        return (None, None, None, None)
    return (w.embedding, w.lexical, w.reranker, w.initial)


@dataclass
class _Item:
    key: Tuple
    query: str
    weights: Optional[QueryWeights]
    future: Future
    rejection_threshold: Optional[float] = None
    use_reranker: bool = True
    want_payload: bool = False
    rejection_cosine_floor: Optional[float] = None


class SearchBatcher:
    def __init__(
        self,
        engine,
        engine_lock,
        window_ms: Optional[float] = None,
        max_batch: Optional[int] = None,
        pipeline_depth: Optional[int] = None,
    ):
        self.engine = engine
        self.engine_lock = engine_lock
        if window_ms is None:
            window_ms = float(os.environ.get("RAG_TPU_BATCH_WINDOW_MS", "3"))
        self.window_s = max(window_ms, 0.0) / 1000.0
        if max_batch is None:
            # remote-attached TPUs pay ~50 ms per dispatch; high-QPS
            # deployments raise this so one dispatch carries more queries
            max_batch = int(os.environ.get("RAG_TPU_BATCH_MAX", "16"))
        self.max_batch = max_batch
        if pipeline_depth is None:
            pipeline_depth = int(
                os.environ.get("RAG_TPU_PIPELINE_DEPTH", "2")
            )
        self.pipeline_depth = max(pipeline_depth, 1)
        self._queue: "queue.Queue[_Item]" = queue.Queue()
        self._inflight = 0
        self._inflight_cv = threading.Condition()
        self._pool = ThreadPoolExecutor(
            max_workers=self.pipeline_depth,
            thread_name_prefix="search-exec",
        )
        # one serializer shared across pipeline threads: the native
        # registry is shared_mutex-guarded; output buffers are per-thread
        self._ser = None
        self._ser_lock = threading.Lock()
        self._serializer_broken = False
        self._thread = threading.Thread(
            target=self._run, name="search-batcher", daemon=True
        )
        self._stopping = threading.Event()
        self._thread.start()

    def stop(self) -> None:
        self._stopping.set()
        self._queue.put(None)  # type: ignore[arg-type]
        self._thread.join(timeout=5)
        self._pool.shutdown(wait=True)
        # fail anything still queued so no caller blocks forever
        try:
            while True:
                item = self._queue.get_nowait()
                if item is not None:
                    item.future.set_exception(
                        RuntimeError("server shutting down")
                    )
        except queue.Empty:
            pass

    def submit(
        self,
        query: str,
        top_k: int,
        diversity: float,
        weights: Optional[QueryWeights],
        rejection_threshold: Optional[float] = None,
        use_reranker: bool = True,
        want_payload: bool = False,
        rejection_cosine_floor: Optional[float] = None,
    ) -> Future:
        """Enqueue one search; returns a concurrent Future resolving to a
        List[SearchResult], or to response-body bytes when want_payload
        (hot lane only — other lanes resolve to objects regardless)."""
        fut: Future = Future()
        key = (
            top_k,
            round(float(diversity), 6),
            _weights_key(weights),
            rejection_threshold,
            bool(use_reranker),
            rejection_cosine_floor,
        )
        self._queue.put(
            _Item(
                key=key,
                query=query,
                weights=weights,
                rejection_threshold=rejection_threshold,
                use_reranker=bool(use_reranker),
                want_payload=want_payload,
                rejection_cosine_floor=rejection_cosine_floor,
                future=fut,
            )
        )
        return fut

    def search(
        self,
        query: str,
        top_k: int,
        diversity: float,
        weights: Optional[QueryWeights],
        rejection_threshold: Optional[float] = None,
        use_reranker: bool = True,
        rejection_cosine_floor: Optional[float] = None,
    ):
        """Blocking search (call from executor threads)."""
        return self.submit(
            query, top_k, diversity, weights,
            rejection_threshold=rejection_threshold,
            use_reranker=use_reranker,
            rejection_cosine_floor=rejection_cosine_floor,
        ).result()

    # ----- worker -----

    def _run(self) -> None:
        import time

        pending: List[_Item] = []
        while not self._stopping.is_set():
            if not pending:
                item = self._queue.get()
                if item is None:
                    break
                pending = [item]
            # Collect more items with the SAME key inside the window —
            # and, while every pipeline slot is busy, KEEP collecting past
            # the window: releasing a fragment early would only queue it
            # behind the in-flight batches anyway, and small batches repay
            # the fixed per-dispatch cost (~50 ms tunnel RTT) at a
            # fraction of the queries. Under light load the window alone
            # bounds added latency; under saturation batches grow to
            # whatever arrives while the device works (anti-convoy).
            deadline = time.monotonic() + self.window_s
            leader_key = pending[0].key
            stash: List[_Item] = []
            while len(pending) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    with self._inflight_cv:
                        saturated = self._inflight >= self.pipeline_depth
                    if not saturated:
                        break
                    remaining = 0.002  # poll while waiting for a slot
                try:
                    item = self._queue.get(timeout=max(remaining, 0.0005))
                except queue.Empty:
                    continue  # re-evaluate window/saturation
                if item is None:
                    self._stopping.set()
                    break
                if item.key == leader_key:
                    pending.append(item)
                else:
                    stash.append(item)

            batch, pending = pending, stash
            if batch:
                # run on the pool: the collector immediately returns to
                # coalescing the NEXT batch while this one's device work
                # is in flight (pipeline depth = pool width)
                with self._inflight_cv:
                    self._inflight += 1
                self._pool.submit(self._run_one, batch)
        # shutdown: fail any stashed items still waiting
        for item in pending:
            item.future.set_exception(RuntimeError("server shutting down"))

    # ----- execution -----

    def _run_one(self, batch: List[_Item]) -> None:
        try:
            self._execute(batch)
        finally:
            with self._inflight_cv:
                self._inflight -= 1
                self._inflight_cv.notify_all()

    def _hot_lane(self, batch: List[_Item]) -> bool:
        top_k, diversity = batch[0].key[0], batch[0].key[1]
        return (
            diversity == 0.0
            and not batch[0].use_reranker
            and self.engine.supports_columnar()
        )

    def _serializer(self):
        if self._ser is None and not self._serializer_broken:
            with self._ser_lock:
                if self._ser is None and not self._serializer_broken:
                    try:
                        from rust_local_rag_tpu.server.serializer import (
                            ResponseSerializer,
                        )

                        self._ser = ResponseSerializer(
                            lambda: self.engine.store
                        )
                    except Exception:  # noqa: BLE001 — native lib absent
                        self._serializer_broken = True
        return self._ser

    def preregister_fragments(self) -> int:
        """Bulk-register response fragments for the whole live index (call
        after load/warmup; serving then skips per-hit fragment builds)."""
        ser = self._serializer()
        return ser.preregister_all() if ser is not None else 0

    def _execute(self, batch: List[_Item]) -> None:
        if not batch:
            return
        top_k = batch[0].key[0]
        debug = os.environ.get("RAG_TPU_BATCH_DEBUG")
        t0 = _time.perf_counter() if debug else 0.0
        try:
            if self._hot_lane(batch):
                self._execute_hot(batch, top_k)
            else:
                self._execute_general(batch, top_k)
        except Exception as e:  # noqa: BLE001
            for it in batch:
                if not it.future.done():
                    it.future.set_exception(e)
            return
        if debug:
            print(
                f"[batcher] n={len(batch)} top_k={top_k} "
                f"{(_time.perf_counter() - t0) * 1000:.0f}ms",
                flush=True,
            )

    def _execute_hot(self, batch: List[_Item], top_k: int) -> None:
        queries = [it.query for it in batch]
        with self.engine_lock.read():
            pending = self.engine.dispatch_search(
                queries,
                top_k,
                batch[0].weights,
                rejection_threshold=batch[0].rejection_threshold,
                rejection_cosine_floor=batch[0].rejection_cosine_floor,
            )
            if pending is None:
                # store empty or lane unsupported after all
                self._execute_general(batch, top_k)
                return
            col = self.engine.fetch_columnar(pending)
            ser = self._serializer()
            for qi, it in enumerate(batch):
                if it.want_payload and ser is not None:
                    it.future.set_result(
                        ser.serialize_query(
                            col.slots[qi], col.vals[qi],
                            col.emb[qi], col.lex[qi],
                            floor=col.floor,
                        )
                    )
                else:
                    it.future.set_result(
                        self.engine.results_from_columnar(col, qi)
                    )

    def _execute_general(self, batch: List[_Item], top_k: int) -> None:
        diversity = batch[0].key[1]
        queries = [it.query for it in batch]
        with self.engine_lock.read():
            results = self.engine.search_with_diversity_batch(
                queries,
                top_k,
                diversity,
                batch[0].weights,
                rejection_threshold=batch[0].rejection_threshold,
                use_reranker=batch[0].use_reranker,
                rejection_cosine_floor=batch[0].rejection_cosine_floor,
            )
        # non-hot lanes resolve to objects even under want_payload; the
        # HTTP layer falls back to json.dumps for those
        for it, res in zip(batch, results):
            it.future.set_result(res)
