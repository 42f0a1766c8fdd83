"""Segmax via lax.reduce_window (window=stride=SEG on the minor axis) after
the monolithic einsum; XLA TPU has a dedicated window-reduce emitter that
the reshape-max formulation may not engage."""
from __future__ import annotations
import time
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/rag_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N, D, Q, K, STEPS, SEG = 1_245_184, 768, 128, 100, 8, 128
NT = N // SEG


@jax.jit
def pipe_rw(qs, corpus):
    st = jnp.einsum("qd,nd->qn", qs, corpus, preferred_element_type=jnp.float32)
    sm = jax.lax.reduce_window(
        st, -jnp.inf, jax.lax.max,
        window_dimensions=(1, SEG), window_strides=(1, SEG),
        padding="VALID")
    return st, sm


@jax.jit
def pipe_rw_select(qs, corpus):
    st, sm = pipe_rw.__wrapped__(qs, corpus)
    s = 128
    _, seg_idx = jax.lax.top_k(sm, s)
    seg3 = st.reshape(Q, NT, SEG)
    cand = jnp.take_along_axis(seg3, seg_idx[:, :, None], axis=1)
    vals, flat = jax.lax.top_k(cand.reshape(Q, s * SEG), K)
    seg_of = jnp.take_along_axis(seg_idx, flat // SEG, axis=1)
    return vals, (seg_of * SEG + flat % SEG).astype(jnp.int32)


def timed(fn, reduce_fn):
    corpus = jax.random.normal(jax.random.PRNGKey(0), (N, D), dtype=jnp.bfloat16)
    qall = jax.random.normal(jax.random.PRNGKey(1), (STEPS, Q, D), dtype=jnp.bfloat16)

    @jax.jit
    def loop(qall, corpus):
        def step(c, qs):
            qs = (qs.astype(jnp.float32) + c * 1e-6).astype(jnp.bfloat16)
            return reduce_fn(*fn(qs, corpus)), ()
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
    import numpy as np
    qs = jax.random.normal(jax.random.PRNGKey(2), (Q, D), dtype=jnp.bfloat16)
    c = jax.random.normal(jax.random.PRNGKey(3), (N, D), dtype=jnp.bfloat16)
    st, sm = pipe_rw(qs, c)
    want = jnp.max(st.reshape(Q, NT, SEG), axis=2)
    np.testing.assert_allclose(np.asarray(sm), np.asarray(want))
    gv, gi = pipe_rw_select(qs, c)
    wv, wi = jax.lax.top_k(st, K)
    print("exact:", np.array_equal(np.asarray(gv), np.asarray(wv)),
          np.array_equal(np.asarray(gi), np.asarray(wi)), flush=True)

    ms = timed(pipe_rw, lambda st, sm: jnp.sum(sm[:, :8]) + jnp.sum(st[:2, :2]))
    print(f"einsum+reduce_window segmax: {ms:7.3f} ms", flush=True)
    ms = timed(pipe_rw_select, lambda v, i: jnp.sum(v) + jnp.sum(i[:4, :4]).astype(jnp.float32))
    print(f"einsum+rw+select: {ms:7.3f} ms ({Q/ms*1000:.0f} qps)", flush=True)


if __name__ == "__main__":
    main()
