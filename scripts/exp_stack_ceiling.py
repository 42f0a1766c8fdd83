"""Serving-STACK ceiling: the full HTTP path (aiohttp + handler + batcher +
futures + native serializer) over a FAKE engine whose device work is free.

Isolates the host serving stack from the TPU: at the measured 787 e2e QPS
(BENCH r3 interim) each request costs ~1.27 ms of single-core host time,
of which only ~0.4 ms is explained by known stages (HTTP ~0.125, BM25 ~0.2,
serialize ~0.066). This experiment answers where the rest goes:

  mode null   — dispatch/fetch return canned arrays instantly: measures
                aiohttp + handler + batcher queue/futures + serializer.
  mode bm25   — adds the real native BM25 scorer over a 1.25M-doc Zipf
                index (no JAX anywhere): the full host path minus device.

Run: python scripts/exp_stack_ceiling.py [null|bm25] [clients] [duration_s]
"""
from __future__ import annotations

import asyncio
import os
import sys
import tempfile
import threading
import time
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_server import _free_port, _run_client, _zipf_texts  # noqa: E402

K = 100


@dataclass
class FakeMeta:
    id: str
    document_name: str
    text: str
    chunk_index: int
    page_number: int
    section: Optional[str] = None


class FakeStore:
    """Just enough ChunkStore surface for the native serializer."""

    def __init__(self, n: int, texts: List[str]):
        self._metas = [
            FakeMeta(
                id=f"c{i}",
                document_name=f"doc{i % 977}.pdf",
                text=texts[i],
                chunk_index=i,
                page_number=1 + i % 40,
            )
            for i in range(n)
        ]
        self.mutations = 0

    def __len__(self):
        return len(self._metas)

    def iter_meta(self):
        return enumerate(self._metas)

    def meta_for_slot(self, slot: int):
        return self._metas[slot]


class FakePending:
    __slots__ = ("nq",)

    def __init__(self, nq):
        self.nq = nq


class FakeColumnar:
    __slots__ = ("vals", "emb", "lex", "slots", "floor", "store")

    def __init__(self, vals, emb, lex, slots, floor, store):
        self.vals, self.emb, self.lex = vals, emb, lex
        self.slots, self.floor, self.store = slots, floor, store


class FakeEngine:
    def __init__(self, n_chunks: int, mode: str, texts: List[str]):
        self.store = FakeStore(min(n_chunks, 4096), texts)
        self.mode = mode
        self.n_chunks = n_chunks
        self.lexical_index = None
        if mode == "bm25":
            from rust_local_rag_tpu.ops.native_bm25 import make_lexical_index

            self.lexical_index = make_lexical_index()
            t0 = time.monotonic()
            for i, t in enumerate(texts):
                self.lexical_index.add_chunk(f"c{i}", t, i)
            print(f"BM25 indexed {len(texts)} ({time.monotonic()-t0:.0f}s)",
                  flush=True)
            t0 = time.monotonic()
            n = self.lexical_index.compile_all()
            print(f"{n} snapshots compiled ({time.monotonic()-t0:.0f}s)",
                  flush=True)
        # canned per-query result rows (top-100 hits on registered slots)
        self._slots = np.arange(K, dtype=np.int32)
        self._vals = np.linspace(0.9, 0.5, K).astype(np.float32)

    def supports_columnar(self):
        return True

    def has_reranker(self):
        return False

    def dispatch_search(self, queries, top_k, weights=None,
                        rejection_threshold=None,
                        rejection_cosine_floor=None):
        if self.lexical_index is not None:
            out_s = np.full(500, -1, np.int32)
            out_v = np.zeros(500, np.float32)
            for q in queries:
                self.lexical_index.score_slots_into(q, 500, out_s, out_v)
        return FakePending(len(queries))

    def fetch_columnar(self, pending):
        nq = pending.nq
        return FakeColumnar(
            vals=np.tile(self._vals, (nq, 1)),
            emb=np.tile(self._vals, (nq, 1)),
            lex=np.zeros((nq, K), np.float32),
            slots=np.tile(self._slots, (nq, 1)),
            floor=0.0,
            store=self.store,
        )

    def results_from_columnar(self, col, qi):
        raise RuntimeError("object lane unexpected in this experiment")

    def search_with_diversity_batch(self, *a, **k):
        raise RuntimeError("general lane unexpected in this experiment")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "null"
    clients = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    duration = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    n_chunks = 1_250_000 if mode == "bm25" else 4096

    os.environ.setdefault("RAG_TPU_BATCH_MAX", str(max(clients, 128)))
    os.environ.setdefault("RAG_TPU_BATCH_WINDOW_MS", "5")

    texts = _zipf_texts(n_chunks)
    eng = FakeEngine(n_chunks, mode, texts)

    from aiohttp import web

    from rust_local_rag_tpu.jobs.job_manager import JobManager
    from rust_local_rag_tpu.jobs.worker import WorkerSupervisor
    from rust_local_rag_tpu.server.http_api import AppContext, build_app
    from rust_local_rag_tpu.utils.rwlock import RwLock

    with tempfile.TemporaryDirectory() as tmp:
        lock = RwLock()
        jm = JobManager(os.path.join(tmp, "jobs.db"))
        sup = WorkerSupervisor(jm, eng, lock, log_dir=tmp)
        sup.start()
        ctx = AppContext(eng, lock, jm, sup, tmp)
        app = build_app(ctx)
        port = _free_port()

        loop_holder = {}
        started = threading.Event()

        def run():
            from rust_local_rag_tpu.server.fastpath import FastPathProtocol

            loop = asyncio.new_event_loop()
            loop_holder["loop"] = loop
            asyncio.set_event_loop(loop)
            runner = web.AppRunner(app, access_log=None)
            loop.run_until_complete(runner.setup())
            if os.environ.get("STACK_FASTPATH", "1") != "0":
                loop.run_until_complete(
                    loop.create_server(
                        lambda: FastPathProtocol(runner.server, ctx, loop),
                        "127.0.0.1", port,
                    )
                )
            else:
                site = web.TCPSite(runner, "127.0.0.1", port)
                loop.run_until_complete(site.start())
            started.set()
            loop.run_forever()

        threading.Thread(target=run, daemon=True).start()
        started.wait(10)
        n = ctx.batcher.preregister_fragments()
        print(f"{n} fragments preregistered", flush=True)

        prof = os.environ.get("STACK_PROFILE")
        if prof:
            import cProfile

            pr = cProfile.Profile()
            # profile sees only the MainThread? No: enable profiling of all
            # threads via threading.setprofile is unreliable; instead profile
            # the event loop thread by sampling with yappi if present.
            pr.enable()

        d = _run_client(port, clients, duration, K, rerank=False)
        qps = d["n"] / d["elapsed"]
        lats = sorted(d["lats"])
        p50 = lats[len(lats) // 2] if lats else -1
        print(
            f"stack ceiling [{mode}] clients={clients}: {qps:.0f} qps "
            f"(p50 {p50:.0f} ms, n={d['n']})",
            flush=True,
        )
        if prof:
            import io
            import pstats

            pr.disable()
            s = io.StringIO()
            pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
            print(s.getvalue()[:5000], flush=True)

        loop_holder["loop"].call_soon_threadsafe(loop_holder["loop"].stop)
        ctx.batcher.stop()
        sup.stop(timeout=5.0)


if __name__ == "__main__":
    main()
