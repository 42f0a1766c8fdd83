"""Probe jax.lax.approx_max_k PartialReduce as an exact segmax producer.
1) what bin count l do we get for various recall targets /
   reduction_input_size_override at N=1.245M, k=100?
2) verify bins are interleaved banks (bin b = indices == b mod l) by
   checking returned argmax indices.
3) time einsum + unaggregated partial reduce."""
from __future__ import annotations
import time
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/rag_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N, D, Q, STEPS = 1_245_184, 768, 128, 8


def probe_l():
    x = jnp.zeros((2, N), jnp.float32)
    for rt in (0.95, 0.98, 0.99, 0.995):
        for k in (100, 256):
            v, i = jax.lax.approx_max_k(x, k, recall_target=rt,
                                        aggregate_to_topk=False)
            print(f"recall={rt} k={k}: l={v.shape[1]}", flush=True)
    for override in (None,):
        pass
    # reduction_input_size_override: pretend input is bigger -> more bins?
    for ov in (5_000_000, 20_000_000):
        v, i = jax.lax.approx_max_k(x, 100, recall_target=0.95,
                                    aggregate_to_topk=False,
                                    reduction_input_size_override=ov)
        print(f"override={ov}: l={v.shape[1]}", flush=True)


def probe_layout(rt=0.99):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, N)).astype(np.float32)
    xv = jnp.asarray(x)
    v, i = jax.lax.approx_max_k(xv, 100, recall_target=rt,
                                aggregate_to_topk=False)
    l = v.shape[1]
    iN = np.asarray(i)
    vN = np.asarray(v)
    # hypothesis: bin b holds indices {j : j % l == b}
    mod = iN % l
    interleaved = np.array_equal(mod, np.tile(np.arange(l), (4, 1)))
    # alt hypothesis: contiguous bins of size ceil(N/l)
    w = -(-N // l)
    contig = np.array_equal(iN // w, np.tile(np.arange(l), (4, 1)))
    print(f"l={l} interleaved={interleaved} contiguous={contig}")
    # verify values are the exact max of the hypothesized bin
    b = 7
    if interleaved:
        members = x[:, b::l]
        print("bin-max exact:", np.allclose(vN[:, b], members.max(axis=1)))
    elif contig:
        members = x[:, b * w:(b + 1) * w]
        print("bin-max exact:", np.allclose(vN[:, b], members.max(axis=1)))


def timing(rt=0.99):
    corpus = jax.random.normal(jax.random.PRNGKey(0), (N, D), dtype=jnp.bfloat16)
    qall = jax.random.normal(jax.random.PRNGKey(1), (STEPS, Q, D), dtype=jnp.bfloat16)

    @jax.jit
    def pipe(qs, corpus):
        st = jnp.einsum("qd,nd->qn", qs, corpus,
                        preferred_element_type=jnp.float32)
        v, i = jax.lax.approx_max_k(st, 100, recall_target=rt,
                                    aggregate_to_topk=False)
        return st, v, i

    @jax.jit
    def loop(qall, corpus):
        def step(c, qs):
            qs = (qs.astype(jnp.float32) + c * 1e-6).astype(jnp.bfloat16)
            st, v, i = pipe(qs, corpus)
            return jnp.sum(v[:, :8]) + jnp.sum(st[:2, :2]), ()
        c, _ = jax.lax.scan(step, jnp.float32(0), qall)
        return c

    float(loop(qall, corpus))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(qall, corpus))
        best = min(best, time.perf_counter() - t0)
    print(f"einsum+partialreduce(rt={rt}): {best / STEPS * 1000:.3f} ms")


if __name__ == "__main__":
    probe_l()
    probe_layout()
    timing(0.99)
    timing(0.95)
