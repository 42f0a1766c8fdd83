"""Experiment: pure-XLA blocked scores+segmax via lax.scan over corpus
blocks. Full-matrix XLA segmax measured +6.4 ms (unfused re-read at
~100 GB/s); per-block the reduce may stay fused or at least re-read at
roofline. Compares block sizes and segmax formulations."""
from __future__ import annotations
import functools
import time
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/rag_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N, D, Q, STEPS, SEG = 1_245_184, 768, 128, 8, 128


def make(bn: int, with_scores: bool):
    nb = N // bn
    pt = bn // SEG
    assert N % bn == 0

    @jax.jit
    def run(queries, corpus):
        c3 = corpus.reshape(nb, bn, D)

        def step(_, cblk):
            st = jnp.einsum(
                "qd,nd->qn", queries, cblk,
                preferred_element_type=jnp.float32,
            )
            sm = jnp.max(st.reshape(Q, pt, SEG), axis=2)
            return 0, ((st if with_scores else None), sm)

        _, (scores, segmax) = jax.lax.scan(step, 0, c3)
        return scores, segmax  # scores [nb, Q, bn] or None; segmax [nb, Q, pt]

    return run


def timed(fn, with_scores):
    corpus = jax.random.normal(jax.random.PRNGKey(0), (N, D), dtype=jnp.bfloat16)
    qall = jax.random.normal(jax.random.PRNGKey(1), (STEPS, Q, D), dtype=jnp.bfloat16)

    @jax.jit
    def loop(qall, corpus):
        def step(c, qs):
            qs = (qs.astype(jnp.float32) + c * 1e-6).astype(jnp.bfloat16)
            s, m = fn(qs, corpus)
            r = jnp.sum(m[:, :8, :4])
            if with_scores:
                r = r + jnp.sum(s[:, :8, :4])
            return r, ()
        c, _ = jax.lax.scan(step, jnp.float32(0), qall)
        return c

    float(loop(qall, corpus))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(qall, corpus))
        best = min(best, time.perf_counter() - t0)
    return best / STEPS * 1000


def main():
    # correctness
    run = make(8192, True)
    qs = jax.random.normal(jax.random.PRNGKey(2), (Q, D), dtype=jnp.bfloat16)
    c = jax.random.normal(jax.random.PRNGKey(3), (N, D), dtype=jnp.bfloat16)
    s, m = run(qs, c)
    import numpy as np
    i = 3
    want = jnp.einsum("qd,nd->qn", qs, c[i * 8192:(i + 1) * 8192],
                      preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(s[i]), np.asarray(want), atol=1e-3)
    print("correct")

    for bn in (8192, 16384, 32768, 65536):
        for ws in (True, False):
            ms = timed(make(bn, ws), ws)
            print(f"xla blocked bn={bn} scores={ws}: {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
