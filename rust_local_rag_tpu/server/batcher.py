"""Search micro-batcher: coalesce concurrent requests into one device pass.

Each device dispatch through a TPU runtime has fixed overhead (on the axon
tunnel, ~50 ms per RPC), and the fused first-stage program is nearly as
cheap for 16 queries as for 1. The batcher groups concurrent /search
requests that share identical parameters (top_k, diversity, weights) inside
a small window and executes them as ONE engine.search_with_diversity_batch
call under a single read lock.

Single requests under no concurrency pay at most `window_ms` extra latency
(default 3 ms); a burst of Q concurrent requests collapses from Q device
dispatches into one.
"""

from __future__ import annotations

import os
import queue
import threading
import time as _time
from concurrent.futures import Future
from dataclasses import dataclass
from typing import List, Optional, Tuple

from rust_local_rag_tpu.config import QueryWeights


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


class SearchBatcher:
    def __init__(
        self,
        engine,
        engine_lock,
        window_ms: Optional[float] = None,
        max_batch: Optional[int] = None,
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
        self._queue: "queue.Queue[_Item]" = queue.Queue()
        self._thread = threading.Thread(
            target=self._run, name="search-batcher", daemon=True
        )
        self._stopping = threading.Event()
        self._thread.start()

    def stop(self) -> None:
        self._stopping.set()
        self._queue.put(None)  # type: ignore[arg-type]
        self._thread.join(timeout=5)
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

    def search(
        self,
        query: str,
        top_k: int,
        diversity: float,
        weights: Optional[QueryWeights],
        rejection_threshold: Optional[float] = None,
        use_reranker: bool = True,
    ):
        """Blocking search (call from executor threads)."""
        fut: Future = Future()
        key = (
            top_k,
            round(float(diversity), 6),
            _weights_key(weights),
            rejection_threshold,
            bool(use_reranker),
        )
        self._queue.put(
            _Item(
                key=key,
                query=query,
                weights=weights,
                rejection_threshold=rejection_threshold,
                use_reranker=bool(use_reranker),
                future=fut,
            )
        )
        return fut.result()

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
            # collect more items with the SAME key inside the window
            deadline = time.monotonic() + self.window_s
            leader_key = pending[0].key
            stash: List[_Item] = []
            while (
                len(pending) < self.max_batch
                and time.monotonic() < deadline
            ):
                remaining = deadline - time.monotonic()
                try:
                    item = self._queue.get(timeout=max(remaining, 0.0005))
                except queue.Empty:
                    break
                if item is None:
                    self._stopping.set()
                    break
                if item.key == leader_key:
                    pending.append(item)
                else:
                    stash.append(item)

            batch, pending = pending, stash
            self._execute(batch)
        # shutdown: fail any stashed items still waiting
        for item in pending:
            item.future.set_exception(RuntimeError("server shutting down"))

    def _execute(self, batch: List[_Item]) -> None:
        if not batch:
            return
        top_k, diversity = batch[0].key[0], batch[0].key[1]
        queries = [it.query for it in batch]
        debug = os.environ.get("RAG_TPU_BATCH_DEBUG")
        t0 = _time.perf_counter() if debug else 0.0
        try:
            with self.engine_lock.read():
                results = self.engine.search_with_diversity_batch(
                    queries,
                    top_k,
                    diversity,
                    batch[0].weights,
                    rejection_threshold=batch[0].rejection_threshold,
                    use_reranker=batch[0].use_reranker,
                )
        except Exception as e:  # noqa: BLE001
            for it in batch:
                it.future.set_exception(e)
            return
        if debug:
            print(
                f"[batcher] n={len(batch)} top_k={top_k} "
                f"{(_time.perf_counter() - t0) * 1000:.0f}ms",
                flush=True,
            )
        for it, res in zip(batch, results):
            it.future.set_result(res)
