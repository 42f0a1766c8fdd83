"""Engine-level scale check (BASELINE.json config 2): a 100k-chunk corpus
through the FULL RagEngine search path — hybrid blend, segmented selection,
MMR diversification — on real TPU, with oracle validation of the ranking.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/scale_check.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/rag_tpu_jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import tempfile

    from rust_local_rag_tpu.engine.chunk_store import ChunkMeta
    from rust_local_rag_tpu.engine.rag_engine import RagEngine
    from rust_local_rag_tpu.models import EmbeddingService, HashEncoder

    n, d = int(os.environ.get("SCALE_N", 100_000)), 768
    top_k = 100
    rng = np.random.default_rng(0)

    svc = EmbeddingService(HashEncoder(dim=d, model_name="scale-check"))
    with tempfile.TemporaryDirectory() as tmp:
        eng = RagEngine(tmp, svc)

        print(f"populating {n} chunks...", flush=True)
        t0 = time.monotonic()
        bs = 20_000
        for lo in range(0, n, bs):
            hi = min(lo + bs, n)
            emb = rng.standard_normal((hi - lo, d)).astype(np.float32)
            emb /= np.linalg.norm(emb, axis=1, keepdims=True)
            metas = [
                ChunkMeta(
                    id=f"c{i}", document_name=f"doc{i % 500}.pdf",
                    text=f"synthetic chunk {i} with filler words alpha beta",
                    chunk_index=i, page_number=(i % 40) + 1,
                )
                for i in range(lo, hi)
            ]
            eng.store.add_chunks(metas, emb)
            for m in metas[:: max(1, (hi - lo) // 200)]:
                eng.lexical_index.add_chunk(m.id, m.text)
        print(f"populated in {time.monotonic() - t0:.1f}s "
              f"(capacity {eng.store.capacity})", flush=True)

        # warm up (compiles)
        t0 = time.monotonic()
        eng.search_with_diversity("alpha beta filler", top_k, 0.3)
        print(f"first search (compile): {time.monotonic() - t0:.1f}s", flush=True)

        # timed warm searches through the full engine path
        queries = [f"synthetic query number {i} alpha" for i in range(20)]
        t0 = time.monotonic()
        for q in queries:
            res = eng.search_with_diversity(q, top_k, 0.3)
        el = time.monotonic() - t0
        print(
            f"warm engine search_with_diversity(top_k={top_k}, mmr=0.3): "
            f"{el / len(queries) * 1000:.1f} ms/query "
            f"({len(queries) / el:.1f} qps single-stream)", flush=True,
        )

        # batched engine path (what the server micro-batcher drives):
        # includes query embedding, lexical scoring, device dispatch,
        # rerank-absent blending, MMR — per-batch host+device cost
        for bq in (16, 64):
            batch = [f"batched query {i} alpha beta" for i in range(bq)]
            eng.search_with_diversity_batch(batch, top_k, 0.3)  # warm shapes
            batch = [f"batched query {i} gamma delta" for i in range(bq)]
            t0 = time.monotonic()
            out = eng.search_with_diversity_batch(batch, top_k, 0.3)
            el = time.monotonic() - t0
            assert len(out) == bq and out[0]
            print(
                f"engine batched x{bq}: {el * 1000:.1f} ms/batch -> "
                f"{bq / el:.1f} qps engine-level", flush=True,
            )

        # oracle validation of the first stage on 3 queries
        import oracle_check

        ok = oracle_check.validate(eng, rng, n_queries=3, top_k=20)
        print(f"oracle ranking parity: {'PASS' if ok else 'FAIL'}", flush=True)
        assert res
        return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
