"""Fused-attention kernel parity vs the XLA reference path.

The Pallas kernel (ops/attention.py) must reproduce softmax(QK^T*scale+bias)V
exactly (one-shot f32 softmax — not a streaming approximation), so the
encoder/reranker forwards give the same embeddings/logits with the kernel on
or off; tests run the kernel in interpreter mode on the CPU platform
(conftest sets RAG_TPU_PALLAS_INTERPRET=1).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rust_local_rag_tpu.ops.attention import fused_attention


def _xla_reference(q, k, v, mask, causal=False):
    B, H, L, Dh = q.shape
    bias = jnp.where(mask[:, None, None, :].astype(bool), 0.0, -1e9)
    if causal:
        tri = jnp.tril(jnp.ones((L, L), dtype=bool))
        bias = jnp.where(tri[None, None], bias, -1e9)
    s = (
        jnp.einsum(
            "bhld,bhmd->bhlm", q, k, preferred_element_type=jnp.float32
        )
        / np.sqrt(Dh)
        + bias
    )
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhlm,bhmd->bhld", p, v)


def _mk(b, h, l, dh, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, h, l, dh), dtype=jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, l, dh), dtype=jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, l, dh), dtype=jnp.bfloat16)
    lens = np.random.default_rng(seed).integers(1, l + 1, size=b)
    mask = (np.arange(l)[None, :] < lens[:, None]).astype(np.int32)
    return q, k, v, jnp.asarray(mask)


@pytest.mark.parametrize("b,h,l,dh", [(4, 2, 128, 64), (2, 8, 256, 64)])
def test_fused_matches_xla(b, h, l, dh):
    q, k, v, mask = _mk(b, h, l, dh)
    got = fused_attention(q, k, v, mask)
    want = _xla_reference(q, k, v, mask)
    m = np.asarray(mask, dtype=bool)
    g = np.asarray(got, dtype=np.float32)
    w = np.asarray(want, dtype=np.float32)
    # compare only valid query rows (padding rows are don't-care: the
    # encoder's masked pooling drops them)
    for bi in range(b):
        np.testing.assert_allclose(
            g[bi, :, m[bi]], w[bi, :, m[bi]], atol=2e-2, rtol=2e-2
        )


def test_fused_causal_matches_xla():
    q, k, v, mask = _mk(2, 4, 128, 64, seed=3)
    got = fused_attention(q, k, v, mask, causal=True)
    want = _xla_reference(q, k, v, mask, causal=True)
    m = np.asarray(mask, dtype=bool)
    g, w = np.asarray(got, np.float32), np.asarray(want, np.float32)
    for bi in range(2):
        np.testing.assert_allclose(
            g[bi, :, m[bi]], w[bi, :, m[bi]], atol=2e-2, rtol=2e-2
        )


def test_encoder_forward_fused_parity():
    from rust_local_rag_tpu.models.encoder import (
        EncoderConfig,
        encoder_forward,
        init_encoder_params,
    )

    cfg = EncoderConfig(
        vocab_size=512, dim=128, depth=2, heads=2, ffn_dim=256, out_dim=128
    )
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, 512, size=(4, 128)), dtype=jnp.int32)
    lens = rng.integers(4, 128, size=4)
    mask = jnp.asarray(
        (np.arange(128)[None] < lens[:, None]).astype(np.int32)
    )
    off = encoder_forward(params, ids, mask, cfg, fused_attn=False)
    on = encoder_forward(params, ids, mask, cfg, fused_attn=True)
    cos = np.sum(np.asarray(off) * np.asarray(on), axis=1)
    assert np.all(cos > 0.999), cos


def test_reranker_forward_fused_parity():
    from rust_local_rag_tpu.models.reranker import (
        RerankerConfig,
        init_reranker_params,
        reranker_forward_last_logits,
    )

    cfg = RerankerConfig(
        vocab_size=512, dim=128, depth=2, heads=2, ffn_dim=256
    )
    params = init_reranker_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(4, 512, size=(4, 128)), dtype=jnp.int32)
    lens = rng.integers(4, 128, size=4)
    mask = jnp.asarray(
        (np.arange(128)[None] < lens[:, None]).astype(np.int32)
    )
    off = reranker_forward_last_logits(params, ids, mask, cfg, fused_attn=False)
    on = reranker_forward_last_logits(params, ids, mask, cfg, fused_attn=True)
    off, on = np.asarray(off), np.asarray(on)
    # same top token and close logit values at the readout position
    assert np.array_equal(off.argmax(axis=1), on.argmax(axis=1))
    np.testing.assert_allclose(on, off, atol=0.1, rtol=0.05)
