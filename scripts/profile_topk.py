"""Decompose the exact-top-k pipeline's per-stage cost on the real chip.

Stages (cumulative, each an on-device lax.scan loop with chained data deps
per the bench methodology — see bench.py):
  matmul       einsum only
  kernel       pallas fused_score_segmax (scores + segment maxima)
  +segtopk     ... + top_k over segment maxima
  +gather      ... + take_along_axis of the selected segments
  +final       ... + final exact top_k (the full pipeline)

The deltas localize the selection overhead (VERDICT r1 weak #3: 9.36 ms
end-to-end vs 4.1 ms matmul — where do the other 5.2 ms go?).
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/rag_tpu_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rust_local_rag_tpu.ops.pallas_topk import SEG, fused_score_segmax

    n = int(os.environ.get("BENCH_N", 1_245_184))  # multiple of 16384
    d, q, k, steps = 768, 128, 100, 8
    s_keep = int(os.environ.get("BENCH_S", 128))

    corpus = jax.random.normal(jax.random.PRNGKey(0), (n, d), dtype=jnp.bfloat16)
    qall = jax.random.normal(jax.random.PRNGKey(1), (steps, q, d), dtype=jnp.bfloat16)

    def timed(stage_fn):
        @jax.jit
        def loop(qall, corpus):
            def step(carry, qs):
                qs = (qs.astype(jnp.float32) + carry * 1e-6).astype(jnp.bfloat16)
                out = stage_fn(qs, corpus)
                return jnp.sum(out).astype(jnp.float32), ()
            c, _ = jax.lax.scan(step, jnp.float32(0), qall)
            return c

        float(loop(qall, corpus))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(qall, corpus))
            best = min(best, time.perf_counter() - t0)
        return best / steps * 1000.0  # ms per batch

    nt = n // SEG

    def st_matmul(qs, c):
        return jnp.einsum("qd,nd->qn", qs, c, preferred_element_type=jnp.float32)[:, :8]

    def st_kernel(qs, c):
        scores, segmax_t = fused_score_segmax.__wrapped__(qs, c)
        return scores[:, :8] + segmax_t[:8].T[:, :8]

    def st_segtopk(qs, c):
        scores, segmax_t = fused_score_segmax.__wrapped__(qs, c)
        _, seg_idx = jax.lax.top_k(segmax_t.T, s_keep)
        return scores[:, :8] + seg_idx[:, :8]

    def st_gather(qs, c):
        scores, segmax_t = fused_score_segmax.__wrapped__(qs, c)
        _, seg_idx = jax.lax.top_k(segmax_t.T, s_keep)
        seg = scores.reshape(q, nt, SEG)
        cand = jnp.take_along_axis(seg, seg_idx[:, :, None], axis=1)
        return cand[:, :8, 0]

    def st_final(qs, c):
        scores, segmax_t = fused_score_segmax.__wrapped__(qs, c)
        _, seg_idx = jax.lax.top_k(segmax_t.T, s_keep)
        seg = scores.reshape(q, nt, SEG)
        cand = jnp.take_along_axis(seg, seg_idx[:, :, None], axis=1)
        cand = cand.reshape(q, s_keep * SEG)
        vals, flat = jax.lax.top_k(cand, k)
        seg_of = jnp.take_along_axis(seg_idx, flat // SEG, axis=1)
        return vals + seg_of[:, :1]

    out = {}
    for name, fn in (
        ("matmul", st_matmul),
        ("kernel", st_kernel),
        ("segtopk", st_segtopk),
        ("gather", st_gather),
        ("final", st_final),
    ):
        out[name + "_ms"] = round(timed(fn), 3)
        print(name, out[name + "_ms"], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
