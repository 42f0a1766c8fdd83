"""Pallas fused attention: QK^T -> masked softmax -> PV with no HBM
materialization of the [B, H, L, L] score tensor.

Why this exists: the encoder ingest path (models/encoder.py) is the
>=50k chunks/s target (BASELINE.md). Left to XLA, each layer's attention
writes the [B, H, L, L] f32 score tensor to HBM and reads it back for the
softmax and again for the PV matmul — at the production bucket
(B=256, H=8, L=256) that is ~1.9 GB of HBM round trips per layer, ~11 GB
per 6-layer forward, which caps ingest at ~30% MXU utilization. The whole
retrieval encoder is non-causal with short buckets (L <= 512), so the full
[L, L] score tile for a (batch, head) block fits VMEM: this kernel computes
scores, softmax, and the PV product per (batch-block, head-block) entirely
on-chip and writes only the [B, H, L, Dh] context back.

Kernel shape: one grid step handles a [bb, hb, L, Dh] q/k/v block folded to
a single BATCHED dot_general over bb*hb (a per-(row, head) Python loop of
[L, Dh] dots serializes 2*bb*H tiny MXU ops per step and measured ~1.6x
SLOWER than XLA; the batched form is one MXU stream). bb/hb are chosen to
keep the f32 score tile + bf16 probs + double-buffered blocks under the
VMEM budget.

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


def _make_kernel(bb: int, hb: int, causal: bool, scale: float):
    def kernel(q_ref, k_ref, v_ref, m_ref, o_ref):
        # blocks: q/k/v/o [bb, hb, L, Dh] bf16; m [1, bb, L] f32 (1 = valid;
        # reshaped to [B/bb, bb, L] outside so the block's trailing dims
        # equal the array dims — a raw [bb, L] block would violate the
        # (8, 128) tile minimum for small bb).
        L, Dh = q_ref.shape[2], q_ref.shape[3]
        bias = jnp.where(m_ref[0] > 0.5, 0.0, jnp.float32(NEG))  # [bb, L]
        # [bb, L] -> [bb*hb, 1, L] key-side bias, head-major repeat
        bias = jnp.repeat(bias, hb, axis=0)[:, None, :]
        if causal:
            li = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
            lj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
            bias = bias + jnp.where(lj > li, jnp.float32(NEG), 0.0)[None]
        q = q_ref[:].reshape(bb * hb, L, Dh)
        k = k_ref[:].reshape(bb * hb, L, Dh)
        v = v_ref[:].reshape(bb * hb, L, Dh)
        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [bb*hb, L, L]
        s = s * scale + bias
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        ctx = jax.lax.dot_general(
            p.astype(q_ref.dtype),
            v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [bb*hb, L, Dh]
        o_ref[:] = ctx.reshape(bb, hb, L, Dh).astype(o_ref.dtype)

    return kernel


def _pick_blocks(b: int, h: int, l: int, dh: int) -> tuple[int, int]:
    """(batch-block, head-block) under a ~10 MB VMEM budget: double-buffered
    q/k/v/o blocks + the f32 score tile + bf16 probs."""
    budget = 10 * 1024 * 1024

    def cost(bb: int, hb: int) -> int:
        blocks = 2 * 4 * bb * hb * l * dh * 2  # qkvo, double-buffered, bf16
        interm = bb * hb * l * l * (4 + 2)  # f32 scores + bf16 probs
        return blocks + interm

    hb = h
    while hb > 1 and cost(1, hb) > budget:
        # largest head divisor under budget
        hb = next(c for c in range(hb - 1, 0, -1) if h % c == 0)
    bb = 1
    for cand in (16, 8, 4, 2):
        if b % cand == 0 and cost(cand, hb) <= budget:
            bb = cand
            break
    return bb, hb


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
    bb, hb = _pick_blocks(b, h, l, dh)
    grid = (b // bb, h // hb)
    m01 = mask.astype(jnp.float32).reshape(b // bb, bb, l)
    qkv_spec = pl.BlockSpec(
        (bb, hb, l, dh), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _make_kernel(bb, hb, causal, scale),
        grid=grid,
        in_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            pl.BlockSpec(
                (1, bb, l), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
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
    """Opt-in (RAG_TPU_FUSED_ATTN=1). Measured on v5e at the ingest bucket
    (256x256, 6L x 512d, Dh=64): attention-only the kernel matches XLA
    (5.9 vs 5.3 ms/layer-batch), but inside the full encoder the pallas_call
    boundary forces materialized [B, H, L, Dh] transposes for q/k/v/ctx that
    the XLA path fuses away, netting 48.7 vs 32.6 ms/batch. Dh=64 also
    half-fills the 128-lane tiles. Stays off until a packed-layout
    ([B, L, H*Dh], Dh=128) variant wins end-to-end; the XLA path already
    meets the ingest target (7.8k chunks/s/chip = 62.7k projected v5e-8)."""
    return os.environ.get("RAG_TPU_FUSED_ATTN", "0") == "1"
