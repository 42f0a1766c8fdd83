"""Pallas kernel: fused query x corpus scoring + per-segment maxima.

The segmented exact top-k (ops/fast_topk.py) needs two reductions over the
score matrix: the scores themselves and their per-segment maxima. Left to
XLA, the [Q, N] f32 score matrix is written to HBM by the matmul and read
back for the segment-max reduction — at N = 1.25M and Q = 128 that is an
extra 640 MB of HBM round trip on the query hot path.

This kernel produces BOTH outputs in one pass over the corpus: each grid
step loads a [BLK_N, D] corpus tile into VMEM, runs the MXU matmul against
the resident query block, writes the score tile, and reduces its segment
maxima on the VPU while the scores are still on-chip. The segmented
selection then proceeds exactly as in fast_topk (top-S segments by max,
exact top-k over gathered candidates) with identical results.

Kernel layout: grid over corpus tiles; queries use a constant index_map so
the block stays resident; segment size is 128 (VPU lane width).

Performance ceiling (measured, round 2 — scripts/exp_*.py): on this
v5e-via-axon toolchain, HBM->VMEM DMA issued from INSIDE a Pallas kernel
is pinned at ~300 GB/s (contiguous; ~96 GB/s for [Q, 32k] strided column
blocks) regardless of block size (2k-32k rows), outstanding-copy depth
(2-16 slots), or static vs fori_loop issue — while XLA's monolithic
matmul emitter moves the same corpus at ~676 GB/s (einsum alone: 4.0 ms
at Q=128, N=1.245M). A resident in-kernel dot_general tops out at
~46 TFLOP/s (vs ~226 sustained through XLA). Alternatives measured and
rejected at Q=128 (vs this kernel's 9.4 ms fused / 11.5 ms with
selection):
  * manual double-buffered streaming kernel: 7.4 ms kernel-only, but its
    memory_space=ANY score output is untiled, and the downstream gather
    pays a ~2 ms relayout — 11.4 ms end to end (a tie);
  * XLA einsum + segmax, all formulations: reshape-max +6.1 ms,
    [NS,SEG,Q] orientation +3.4 ms, reduce_window +6.5 ms, lax.scan over
    corpus blocks 7.7-8.4 ms even WITHOUT score output;
  * einsum + separate Pallas segmax pass over the scores: 13.3 ms
    (strided DMA + boundary relayout);
  * approx_max_k(aggregate_to_topk=False) as a bin-max producer: 54 ms
    (lowers to an unfused slow path; bin layout is also opaque).
This kernel's 9.4 ms sits near the in-kernel DMA roofline
((1.9 GB corpus + 0.64 GB scores) / 300 GB/s = 8.5 ms), so per-batch
latency at Q=128 is toolchain-bound. Throughput instead scales with the
query batch: the corpus read amortizes over Q, so larger batches raise
exact QPS/chip well past the Q=128 figure (see bench.py).

Cites: reference hot loop rag_engine.rs:522-561 (per-candidate dot products
on CPU) — this kernel is its TPU replacement at the other end of the
performance scale.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEG = 128  # segment size == VPU lane width

NEG_INF = float("-inf")  # python float: trace-safe module constant (see ops/topk.py)


def _score_segmax_kernel(q_ref, c_ref, scores_ref, segmax_ref):
    # Grid: (outer, inner). Each inner step scores one [BLK_N, D] corpus
    # tile; INNER_TILES consecutive inner steps share one segmax block
    # (TPU block specs need a 128-wide last dim, and BLK_N // SEG == 16,
    # so 8 tiles' maxima pack into one (Q, 128) block).
    i = pl.program_id(1)
    s = jax.lax.dot_general(
        q_ref[:],
        c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores_ref[:] = s
    qn, blk = s.shape
    per_tile = blk // SEG  # segments produced by one tile
    seg = jnp.max(s.reshape(qn, per_tile, SEG), axis=2)
    # store transposed: [segments, Q]. Lane-dim stores must be 128-aligned
    # on TPU; the 16-row sublane slice at offset i*16 is 8-aligned, so the
    # segmax buffer lives as [N // SEG, Q] and is transposed by the caller.
    segmax_ref[pl.ds(i * per_tile, per_tile), :] = seg.T


INNER_TILES = 8  # tiles whose segment maxima share one output block


def auto_block_n(q: int, d: int, itemsize: int = 2):
    """Largest corpus tile whose double-buffered pipeline fits XLA's 16 MB
    scoped-VMEM budget at query batch q (the resident query block and the
    [q, block_n] f32 score tiles grow with q; the corpus-read rate is flat
    across 1024-2048-row tiles on this toolchain, so shrinking tiles to
    admit large serving batches costs nothing). Returns None when NO tile
    fits — callers fall back to the XLA path (ops/hybrid.py does).

    The floor is 1024: the in-kernel segmax store writes per_tile =
    block_n // SEG sublane rows at offsets i * per_tile, and TPU sublane
    slices need 8-row alignment — block_n < 1024 would make per_tile < 8.
    f32 slabs carry a surcharge: the MXU has no native f32 pass, so f32
    dots decompose into multiple bf16 passes with extra Mosaic-side tile
    buffers (measured: Q=512 f32 blk=2048 allocates 21.6 MB vs the naive
    12 MB estimate). The supported kernel query batch therefore tops out
    at 512 for bf16 768-d slabs and 256 for f32."""
    budget = 14 * 1024 * 1024  # leave slack under the 16 MB scoped limit
    for blk in (2048, 1024):
        need = 2 * (blk * d * itemsize + q * blk * 4) + q * d * itemsize
        if itemsize >= 4:
            need += 2 * blk * d * 4  # multi-pass f32 dot tile surcharge
        if need <= budget:
            return blk
    return None


@functools.partial(jax.jit, static_argnames=("block_n",))
def fused_score_segmax(
    queries: jax.Array, corpus: jax.Array, block_n: int | None = None
):
    """[Q, D] x [N, D] -> (scores [Q, N] f32, segmax [N // SEG, Q] f32).

    segmax comes back TRANSPOSED (segments-major) due to TPU store
    alignment; callers transpose (cheap relative to the scan).

    N must be a multiple of block_n * INNER_TILES (the engine's slab
    capacities are powers of two; bench shapes are padded by the caller).
    block_n=None picks the largest tile fitting the scoped-VMEM budget
    for this query batch (2048 up to Q=256, smaller beyond).
    """
    q, d = queries.shape
    n = corpus.shape[0]
    if block_n is None:
        block_n = auto_block_n(q, d, corpus.dtype.itemsize)
        if block_n is None:
            raise ValueError(
                f"query batch {q} too large for the fused kernel at "
                f"dtype itemsize {corpus.dtype.itemsize} (no corpus tile "
                "fits the scoped-VMEM budget) — use the XLA path"
            )
    group = block_n * INNER_TILES
    if n % group != 0 or block_n % SEG != 0:
        raise ValueError(
            f"N ({n}) must divide by block_n*{INNER_TILES} ({group}), "
            f"block_n by {SEG}"
        )
    seg_block = (block_n // SEG) * INNER_TILES  # 128 for block_n=2048
    grid = (n // group, INNER_TILES)
    return pl.pallas_call(
        _score_segmax_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q, d), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_n, d),
                lambda j, i: (j * INNER_TILES + i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (q, block_n),
                lambda j, i: (0, j * INNER_TILES + i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (seg_block, q), lambda j, i: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, n), jnp.float32),
            jax.ShapeDtypeStruct((n // SEG, q), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q * d * n,
            bytes_accessed=(
                q * d * queries.dtype.itemsize
                + n * d * corpus.dtype.itemsize
                + q * n * 4
                + q * (n // SEG) * 4
            ),
            transcendentals=0,
        ),
        # interpreter mode for non-TPU backends (tests on the CPU mesh)
        interpret=bool(os.environ.get("RAG_TPU_PALLAS_INTERPRET")),
    )(queries, corpus)


@functools.partial(jax.jit, static_argnames=("k", "num_segments", "block_n"))
def pallas_segmented_topk(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    num_segments: int = 256,
    block_n: int | None = None,
):
    """Exact top-k: Pallas fused scoring/segmax + segmented selection.

    Same exactness argument as fast_topk.segmented_exact_topk (S >= k).
    """
    q = queries.shape[0]
    n = corpus.shape[0]
    scores, segmax_t = fused_score_segmax(queries, corpus, block_n=block_n)
    segmax = segmax_t.T
    nt = n // SEG
    s = min(max(num_segments, k), nt)

    _, seg_idx = jax.lax.top_k(segmax, s)  # [Q, S]
    seg = scores.reshape(q, nt, SEG)
    cand = jnp.take_along_axis(seg, seg_idx[:, :, None], axis=1)
    cand = cand.reshape(q, s * SEG)
    vals, flat = jax.lax.top_k(cand, k)
    seg_of = jnp.take_along_axis(seg_idx, flat // SEG, axis=1)
    idx = seg_of * SEG + (flat % SEG)
    return vals, idx.astype(jnp.int32)


def _make_masked_kernel(precision):
    def _score_segmax_masked_kernel(q_ref, c_ref, m_ref, scores_ref, segmax_ref):
        # Masked variant: invalid slots are -inf in BOTH outputs, so the
        # segmented-selection exactness proof holds on slabs with freed
        # slots. Precision follows the slab dtype: f32 slabs use HIGHEST so
        # rankings match the reference's f32 math; bf16 slabs use default
        # passes (the inputs carry bf16 data precision already).
        i = pl.program_id(1)
        s = jax.lax.dot_general(
            q_ref[:],
            c_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        m = m_ref[:]  # [1, BLK_N] f32 (1.0 = live slot; int8 compares are
        # not supported by every Mosaic target)
        s = jnp.where(m > 0.5, s, float("-inf"))
        scores_ref[:] = s
        qn, blk = s.shape
        per_tile = blk // SEG
        seg = jnp.max(s.reshape(qn, per_tile, SEG), axis=2)
        segmax_ref[pl.ds(i * per_tile, per_tile), :] = seg.T

    return _score_segmax_masked_kernel


@functools.partial(jax.jit, static_argnames=("block_n",))
def fused_score_segmax_masked(
    queries: jax.Array,
    corpus: jax.Array,
    valid_mask: jax.Array,  # [N] bool
    block_n: int | None = None,
):
    """Masked fused pass -> (masked scores [Q, N] f32,
    masked segmax [N // SEG, Q] f32). block_n=None: auto (see
    fused_score_segmax)."""
    q, d = queries.shape
    n = corpus.shape[0]
    if block_n is None:
        block_n = auto_block_n(q, d, corpus.dtype.itemsize)
        if block_n is None:
            raise ValueError(
                f"query batch {q} too large for the fused kernel at "
                f"dtype itemsize {corpus.dtype.itemsize} (no corpus tile "
                "fits the scoped-VMEM budget) — use the XLA path"
            )
    group = block_n * INNER_TILES
    if n % group != 0 or block_n % SEG != 0:
        raise ValueError(
            f"N ({n}) must divide by block_n*{INNER_TILES} ({group})"
        )
    seg_block = (block_n // SEG) * INNER_TILES
    mask01 = valid_mask.astype(jnp.float32).reshape(1, n)
    grid = (n // group, INNER_TILES)
    precision = (
        jax.lax.Precision.HIGHEST
        if corpus.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    return pl.pallas_call(
        _make_masked_kernel(precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((q, d), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_n, d),
                lambda j, i: (j * INNER_TILES + i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_n),
                lambda j, i: (0, j * INNER_TILES + i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (q, block_n),
                lambda j, i: (0, j * INNER_TILES + i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (seg_block, q), lambda j, i: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, n), jnp.float32),
            jax.ShapeDtypeStruct((n // SEG, q), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q * d * n,
            bytes_accessed=(
                q * d * queries.dtype.itemsize
                + n * d * corpus.dtype.itemsize
                + n * 4
                + q * n * 4
                + q * (n // SEG) * 4
            ),
            transcendentals=0,
        ),
        interpret=bool(os.environ.get("RAG_TPU_PALLAS_INTERPRET")),
    )(queries, corpus, mask01)
