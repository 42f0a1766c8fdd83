"""Probe: why is manual HBM->VMEM DMA pinned at ~293 GB/s?
Static unrolled copies vs fori_loop; varying outstanding copy count.
A tiny per-step operand defeats loop-invariant hoisting without
touching the 1.9 GB corpus."""
from __future__ import annotations
import time
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/rag_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N, D, STEPS = 1_245_184, 768, 8
GB = N * D * 2 / 1e9


def make(blk: int, slots: int, static: bool):
    nchunks = N // blk

    def kernel(tag_ref, c_hbm, out_ref, c_buf, in_sem):
        def dma(i, s):
            return pltpu.make_async_copy(
                c_hbm.at[pl.ds(i * blk, blk), :], c_buf.at[s], in_sem.at[s]
            )

        if static:
            for s in range(min(slots, nchunks)):
                dma(s, s).start()
            for i in range(nchunks):
                s = i % slots
                dma(i, s).wait()
                if i + slots < nchunks:
                    dma(i + slots, s).start()
        else:
            for s in range(min(slots, nchunks)):
                dma(s, s).start()

            def body(i, _):
                s = jax.lax.rem(i, slots)
                dma(i, s).wait()

                @pl.when(i + slots < nchunks)
                def _():
                    dma(i + slots, jax.lax.rem(i, slots)).start()

                return 0

            jax.lax.fori_loop(0, nchunks, body, 0)
        out_ref[:, :] = tag_ref[:, :] + c_buf[0, :1, :128].astype(jnp.float32)

    @jax.jit
    def run(tag, corpus):
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((slots, blk, D), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((slots,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024
            ),
        )(tag, corpus)

    return run


def timed(fn):
    corpus = jax.random.normal(jax.random.PRNGKey(0), (N, D), dtype=jnp.bfloat16)
    tags = jnp.arange(STEPS * 128, dtype=jnp.float32).reshape(STEPS, 1, 128)

    @jax.jit
    def loop(tags, corpus):
        def step(c, tag):
            r = fn(tag + c, corpus)
            return jnp.sum(r), ()
        c, _ = jax.lax.scan(step, jnp.float32(0), tags)
        return c

    float(loop(tags, corpus))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(tags, corpus))
        best = min(best, time.perf_counter() - t0)
    return best / STEPS * 1000


def main():
    for blk, slots, static in (
        (8192, 2, True), (8192, 4, True), (2048, 8, True), (2048, 16, True),
        (32768, 2, True), (8192, 2, False), (2048, 16, False),
    ):
        try:
            ms = timed(make(blk, slots, static))
            print(f"blk={blk} slots={slots} static={static}: {ms:7.3f} ms  {GB / ms * 1000:5.0f} GB/s", flush=True)
        except Exception as e:
            print(f"blk={blk} slots={slots} static={static}: FAIL {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
