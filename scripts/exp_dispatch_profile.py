"""Decompose the hot-lane (dispatch_search/fetch_columnar) batch time at
the 1.25M server shape: query tokenize+encode dispatch, BM25, search
dispatch, blocking fetch, native serialization. Identifies where the
engine-pipelined lane's per-batch wall time goes."""
from __future__ import annotations

import sys, tempfile, time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/rag_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo/scripts")
from bench_server import _build_engine, _zipf_queries

import numpy as np

QB = int(sys.argv[1]) if len(sys.argv) > 1 else 512
K = 100

with tempfile.TemporaryDirectory() as tmp:
    t0 = time.monotonic()
    eng = _build_engine(1_250_000, tmp, log=lambda m: print(m, flush=True))
    print(f"engine built ({time.monotonic() - t0:.0f}s)", flush=True)
    t0 = time.monotonic()
    print("snapshots:", eng.lexical_index.compile_all(),
          f"({time.monotonic() - t0:.0f}s)", flush=True)

    qs = _zipf_queries(QB)
    # warm
    pend = eng.dispatch_search(qs, K)
    col = eng.fetch_columnar(pend)
    from rust_local_rag_tpu.server.serializer import ResponseSerializer

    ser = ResponseSerializer(lambda: eng.store)
    ser.preregister_all()

    def t(label, fn, reps=3):
        fn()  # warm
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        dt = (time.perf_counter() - t0) / reps * 1000
        print(f"{label:<28} {dt:8.1f} ms", flush=True)
        return out

    nq_pad = len(qs)
    t("prep_queries (tok+enc disp)", lambda: eng._prep_queries(qs, nq_pad))
    t("prep_queries + block", lambda: np.asarray(
        eng._prep_queries(qs, nq_pad)).shape)
    t("prep_lexical", lambda: eng._prep_lexical(qs, K, nq_pad))
    t("dispatch_search (no fetch)", lambda: eng.dispatch_search(qs, K))
    t("dispatch+fetch", lambda: eng.fetch_columnar(eng.dispatch_search(qs, K)))

    col = eng.fetch_columnar(eng.dispatch_search(qs, K))

    def serialize_all():
        for qi in range(len(qs)):
            ser.serialize_query(col.slots[qi], col.vals[qi], col.emb[qi],
                                col.lex[qi], floor=col.floor)

    t("serialize batch", serialize_all)

    # pipelined steady state
    reps = 8
    pend = eng.dispatch_search(qs, K)
    t0 = time.perf_counter()
    for _ in range(reps - 1):
        nxt = eng.dispatch_search(qs, K)
        col = eng.fetch_columnar(pend)
        serialize_all()
        pend = nxt
    eng.fetch_columnar(pend)
    dt = (time.perf_counter() - t0) / (reps - 1) * 1000
    print(f"{'pipelined iter (1 thread)':<28} {dt:8.1f} ms "
          f"-> {QB / dt * 1000:.0f} qps", flush=True)
