"""Experiment: isolate the streaming-kernel floor (DMA vs MXU vs loop).

exp_stream_kernel.py showed every Pallas variant lands at ~7.4 ms vs
XLA einsum's 3.77 ms (HBM roofline) at N=1.245M, Q=128, D=768. This
probe runs the SAME fori_loop structure in ablated modes:

  dma    — in-DMA the corpus, no dot (floor = HBM read 1.9 GB ~ 2.8 ms)
  dot    — dot on a resident VMEM block, no streaming (floor = MXU
           0.40 GFLOP/chunk ~ 1.8 us/chunk ~ 1.1 ms total)
  both   — dot + streaming, segmax out only (no [Q,N] score write)
  both4  — same with 4-slot ring buffering
and prints per-chunk microseconds so the serialization term is visible.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/rag_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N, D, Q, STEPS = 1_245_184, 768, 128, 8
BLK = 2048
SEG = 128
PT = BLK // SEG
NCHUNKS = N // BLK


def make(mode: str, slots: int = 2):
    def kernel(q_ref, c_hbm, segmax_ref, c_buf, in_sem):
        def in_dma(slot, i):
            return pltpu.make_async_copy(
                c_hbm.at[pl.ds(i * BLK, BLK), :], c_buf.at[slot], in_sem.at[slot]
            )

        def compute(slot, i):
            st = jax.lax.dot_general(
                q_ref[:],
                c_buf[slot],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Q, BLK]
            segv = jnp.max(st.reshape(Q, PT, SEG), axis=2).T  # [PT, Q]
            segmax_ref[pl.ds(i * PT, PT), :] = segv

        if mode == "dot":
            # one DMA to fill slot 0, then dot the resident block NCHUNKS times
            in_dma(0, 0).start()
            in_dma(0, 0).wait()

            def body(i, _):
                compute(0, i)
                return 0

            jax.lax.fori_loop(0, NCHUNKS, body, 0)
            return

        # streaming modes: prefill slots-1 DMAs, ring buffer
        for s in range(slots - 1):
            in_dma(s, s).start()

        def body(i, _):
            slot = jax.lax.rem(i, slots)
            nxt = jax.lax.rem(i + slots - 1, slots)

            @pl.when(i + slots - 1 < NCHUNKS)
            def _():
                in_dma(nxt, i + slots - 1).start()

            in_dma(slot, i).wait()
            if mode == "dma":
                # touch one lane so the copy isn't dead
                segmax_ref[pl.ds(i * PT, 1), :] = c_buf[slot, :1, :Q].astype(
                    jnp.float32
                )
            else:
                compute(slot, i)
            return 0

        jax.lax.fori_loop(0, NCHUNKS, body, 0)

    @jax.jit
    def run(queries, corpus):
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N // SEG, Q), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((slots, BLK, D), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((slots,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
        )(queries, corpus)

    return run


def timed(fn):
    corpus = jax.random.normal(jax.random.PRNGKey(0), (N, D), dtype=jnp.bfloat16)
    qall = jax.random.normal(jax.random.PRNGKey(1), (STEPS, Q, D), dtype=jnp.bfloat16)

    @jax.jit
    def loop(qall, corpus):
        def step(c, qs):
            qs = (qs.astype(jnp.float32) + c * 1e-6).astype(jnp.bfloat16)
            m = fn(qs, corpus)
            return jnp.sum(m[:8, :8]), ()

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
    for label, fn in (
        ("dma  slots=2", make("dma", 2)),
        ("dma  slots=4", make("dma", 4)),
        ("dot  resident", make("dot")),
        ("both slots=2", make("both", 2)),
        ("both slots=4", make("both", 4)),
    ):
        ms = timed(fn)
        print(
            f"{label}: {ms:7.3f} ms  ({ms * 1000 / NCHUNKS:6.2f} us/chunk)",
            flush=True,
        )


if __name__ == "__main__":
    main()
