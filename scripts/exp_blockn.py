"""Sweep the production grid kernel's block_n (and selection width S)."""
from __future__ import annotations
import time
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/rag_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rust_local_rag_tpu.ops.pallas_topk import pallas_segmented_topk

N, D, Q, K, STEPS = 1_245_184, 768, 128, 100, 8


def timed(block_n, s_keep):
    corpus = jax.random.normal(jax.random.PRNGKey(0), (N, D), dtype=jnp.bfloat16)
    qall = jax.random.normal(jax.random.PRNGKey(1), (STEPS, Q, D), dtype=jnp.bfloat16)

    @jax.jit
    def loop(qall, corpus):
        def step(c, qs):
            qs = (qs.astype(jnp.float32) + c * 1e-6).astype(jnp.bfloat16)
            v, _ = pallas_segmented_topk.__wrapped__(
                qs, corpus, K, num_segments=s_keep, block_n=block_n)
            return jnp.sum(v).astype(jnp.float32), ()
        c, _ = jax.lax.scan(step, jnp.float32(0), qall)
        return c

    float(loop(qall, corpus))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(qall, corpus))
        best = min(best, time.perf_counter() - t0)
    return best / STEPS * 1000


for blk, s in ((2048, 128), (4096, 128), (8192, 128), (1024, 128), (2048, 100)):
    try:
        ms = timed(blk, s)
        print(f"grid blk={blk} S={s}: {ms:7.3f} ms ({Q/ms*1000:.0f} qps)", flush=True)
    except Exception as e:
        print(f"grid blk={blk} S={s}: FAIL {str(e)[:90]}", flush=True)
