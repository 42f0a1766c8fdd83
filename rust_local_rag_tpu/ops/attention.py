"""Pallas fused attention: QK^T -> masked softmax -> PV with no HBM
materialization of the [B, H, L, L] score tensor.

Why this exists: the encoder ingest path (models/encoder.py) is the
>=50k chunks/s target (BASELINE.md). Left to XLA, each layer's attention
writes the [B, H, L, L] f32 score tensor to HBM and reads it back for the
softmax and again for the PV matmul — at the production bucket
(B=256, H=8, L=256) that is ~1.9 GB of HBM round trips per layer, ~11 GB
per 6-layer forward, which caps ingest at ~30% MXU utilization. The whole
retrieval encoder is non-causal with short buckets (L <= 512), so the full
[L, L] score tile for one (batch, head) fits VMEM comfortably: this kernel
computes scores, softmax, and the PV product per (batch-block, head)
entirely on-chip and writes only the [B, H, L, Dh] context back.

Exact one-shot softmax (max-subtracted, f32) — not an online/streaming
approximation; results match the XLA reference path to bf16 rounding
(tests/test_attention.py asserts the parity).

Reference behavior being accelerated: embeddings.rs:60-182 ships chunks to
Ollama over HTTP for embedding; this kernel is part of its on-TPU
replacement at the other end of the performance scale.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9  # finite mask bias: keeps softmax well-defined for padded rows


def _make_kernel(bb: int, heads: int, causal: bool, scale: float):
    def kernel(q_ref, k_ref, v_ref, m_ref, o_ref):
        # blocks: q/k/v/o [bb, H, L, Dh] bf16; m [1, bb, L] f32 — the mask
        # arrives reshaped to [B/bb, bb, L] so its block's trailing dims
        # equal the array dims (a raw [bb, L] block would violate the
        # (8, 128) tile minimum for small bb).
        L = q_ref.shape[2]
        bias_rows = jnp.where(
            m_ref[0] > 0.5, 0.0, jnp.float32(NEG)
        )  # [bb, L]: 0 valid, NEG pad
        if causal:
            li = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
            lj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
            causal_bias = jnp.where(lj > li, jnp.float32(NEG), 0.0)
        for b in range(bb):
            bias = bias_rows[b][None, :]  # [1, L] key-side padding
            if causal:
                bias = bias + causal_bias
            for h in range(heads):
                s = jax.lax.dot_general(
                    q_ref[b, h],
                    k_ref[b, h],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                s = s * scale + bias
                s = s - jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                o_ref[b, h] = jax.lax.dot_general(
                    p.astype(q_ref.dtype),
                    v_ref[b, h],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(o_ref.dtype)

    return kernel


def _batch_block(b: int, heads: int, seq: int, head_dim: int) -> int:
    """Largest batch block whose VMEM footprint stays ~<= 8 MB (q/k/v/o
    double-buffered by the pipeline + one f32 [L, L] score tile)."""
    per_row = 4 * heads * seq * head_dim * 2  # q,k,v,o bf16
    budget = 8 * 1024 * 1024 - 4 * seq * seq
    bb = max(1, budget // max(per_row * 2, 1))
    for cand in (16, 8, 4, 2, 1):
        if cand <= bb and b % cand == 0:
            return cand
    return 1


@functools.partial(jax.jit, static_argnames=("causal",))
def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    causal: bool = False,
) -> jax.Array:
    """[B, H, L, Dh] q/k/v (bf16) + [B, L] mask (1 = valid key) ->
    [B, H, L, Dh] context, softmax(QK^T * Dh^-0.5 + mask bias) V.

    Rows whose query position is padding produce a uniform-attention
    context; callers mask them out downstream (mean pooling / last-token
    readout), matching the XLA reference path's behavior.
    """
    b, h, l, dh = q.shape
    scale = 1.0 / (dh**0.5)
    bb = _batch_block(b, h, l, dh)
    grid = (b // bb,)
    m01 = mask.astype(jnp.float32).reshape(b // bb, bb, l)
    qkv_spec = pl.BlockSpec(
        (bb, h, l, dh), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _make_kernel(bb, h, causal, scale),
        grid=grid,
        in_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            pl.BlockSpec(
                (1, bb, l), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, l, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * l * l * dh,
            bytes_accessed=4 * b * h * l * dh * q.dtype.itemsize
            + b * l * 4,
            transcendentals=b * h * l * l,
        ),
        interpret=bool(os.environ.get("RAG_TPU_PALLAS_INTERPRET")),
    )(q, k, v, m01)


def use_fused_attention() -> bool:
    """Opt-in (RAG_TPU_FUSED_ATTN=1): measured on v5e the first-cut kernel
    underperforms the XLA path (50.8 vs 32.6 ms/256x256 encoder batch — the
    per-(row, head) unrolled loop serializes 32 small MXU dots per grid
    step); default stays off until the batched-dot redesign wins."""
    return os.environ.get("RAG_TPU_FUSED_ATTN", "0") == "1"
