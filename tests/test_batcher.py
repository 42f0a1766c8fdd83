"""Search micro-batcher: coalescing, key isolation, error propagation."""

import threading
import time

import pytest

from rust_local_rag_tpu.config import QueryWeights
from rust_local_rag_tpu.server.batcher import SearchBatcher
from rust_local_rag_tpu.utils.rwlock import RwLock


class RecordingEngine:
    """Engine stub that records batch compositions."""

    def __init__(self, delay=0.0):
        self.batches = []
        self.delay = delay
        self.lock = threading.Lock()

    def search_with_diversity_batch(
        self,
        queries,
        top_k,
        diversity,
        weights,
        rejection_threshold=None,
        use_reranker=True,
        rejection_cosine_floor=None,
        rejection_query_floor=None,
        rejection_unseen_mass=None,
        rejection_unseen_cos=None,
        rejection_unseen_judge=None,
    ):
        with self.lock:
            self.batches.append(list(queries))
        if self.delay:
            time.sleep(self.delay)
        return [[f"{q}::result"] for q in queries]


def test_single_request_passes_through():
    eng = RecordingEngine()
    b = SearchBatcher(eng, RwLock(), window_ms=1)
    try:
        out = b.search("hello", 5, 0.3, None)
        assert out == ["hello::result"]
        assert eng.batches == [["hello"]]
    finally:
        b.stop()


def test_concurrent_same_key_coalesced():
    eng = RecordingEngine(delay=0.02)
    b = SearchBatcher(eng, RwLock(), window_ms=30, max_batch=16)
    try:
        results = {}
        def go(q):
            results[q] = b.search(q, 5, 0.3, None)
        threads = [threading.Thread(target=go, args=(f"q{i}",)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(results[f"q{i}"] == [f"q{i}::result"] for i in range(8))
        # fewer executions than requests -> coalescing happened
        assert len(eng.batches) < 8
        assert sum(len(batch) for batch in eng.batches) == 8
    finally:
        b.stop()


def test_different_keys_not_mixed():
    eng = RecordingEngine(delay=0.01)
    b = SearchBatcher(eng, RwLock(), window_ms=20)
    try:
        results = {}
        def go(q, top_k):
            results[q] = b.search(q, top_k, 0.3, None)
        threads = [
            threading.Thread(target=go, args=(f"a{i}", 5)) for i in range(3)
        ] + [
            threading.Thread(target=go, args=(f"b{i}", 7)) for i in range(3)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # every executed batch is homogeneous in its key -> queries from the
        # two groups never share a batch
        for batch in eng.batches:
            prefixes = {q[0] for q in batch}
            assert len(prefixes) == 1
        assert len(results) == 6
    finally:
        b.stop()


def test_weights_in_key():
    eng = RecordingEngine(delay=0.01)
    b = SearchBatcher(eng, RwLock(), window_ms=20)
    try:
        r1, r2 = {}, {}
        t1 = threading.Thread(
            target=lambda: r1.update(x=b.search("w1", 5, 0.3, QueryWeights(embedding=0.5)))
        )
        t2 = threading.Thread(
            target=lambda: r2.update(x=b.search("w2", 5, 0.3, QueryWeights(embedding=0.9)))
        )
        t1.start(); t2.start(); t1.join(); t2.join()
        for batch in eng.batches:
            assert len(batch) == 1  # different weights -> separate batches
    finally:
        b.stop()


def test_error_propagates_to_all_waiters():
    class BrokenEngine:
        def search_with_diversity_batch(self, *a, **k):
            raise RuntimeError("device on fire")

    b = SearchBatcher(BrokenEngine(), RwLock(), window_ms=1)
    try:
        with pytest.raises(RuntimeError, match="device on fire"):
            b.search("q", 5, 0.3, None)
    finally:
        b.stop()


def test_stop_fails_pending_waiters():
    import concurrent.futures

    class SlowEngine:
        def search_with_diversity_batch(self, queries, *a, **k):
            time.sleep(0.3)
            return [[f"{q}::r"] for q in queries]

    b = SearchBatcher(SlowEngine(), RwLock(), window_ms=1)
    results = {}

    def go():
        try:
            results["x"] = b.search("q1", 5, 0.3, None)
        except RuntimeError as e:
            results["err"] = str(e)

    t = threading.Thread(target=go)
    t.start()
    time.sleep(0.05)  # the worker is mid-execution
    b.stop()
    t.join(5)
    # the in-flight item completes OR a queued one fails cleanly — either
    # way the waiter is released
    assert "x" in results or "err" in results
