"""Decompose engine.search_batch time at the 1.25M-chunk server shape:
query embed, lexical (BM25), device dispatch, host materialization."""
from __future__ import annotations
import cProfile, io, pstats, sys, tempfile, time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/rag_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo/scripts")
from bench_server import _build_engine

with tempfile.TemporaryDirectory() as tmp:
    t0 = time.monotonic()
    eng = _build_engine(1_250_000, tmp)
    print(f"engine built ({time.monotonic() - t0:.0f}s)", flush=True)

    qs = [f"client {i} probe {i} synthetic retrieval" for i in range(128)]
    # warm (compile)
    eng.search_batch(qs, 100, use_reranker=False)
    print("warmed", flush=True)

    t0 = time.perf_counter()
    eng.search_batch(qs, 100, use_reranker=False)
    print(f"search_batch(128, k=100): {time.perf_counter() - t0:.3f}s", flush=True)

    pr = cProfile.Profile()
    pr.enable()
    eng.search_batch(qs, 100, use_reranker=False)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(22)
    print(s.getvalue()[:4000], flush=True)
