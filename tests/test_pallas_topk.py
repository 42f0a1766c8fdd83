"""Pallas fused score+segmax kernel vs references (interpreter mode on CPU;
the same kernel is verified compiled on real TPU hardware by bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from rust_local_rag_tpu.ops.pallas_topk import (
    SEG,
    fused_score_segmax,
    pallas_segmented_topk,
)


def _unit(rng, n, d):
    m = rng.standard_normal((n, d)).astype(np.float32)
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def test_fused_score_segmax_matches_xla(rng):
    q, n, d = 8, 16384, 256
    queries = jnp.asarray(_unit(rng, q, d))
    corpus = jnp.asarray(_unit(rng, n, d))
    scores, segmax_t = fused_score_segmax(queries, corpus, block_n=2048)
    ref = jnp.einsum("qd,nd->qn", queries, corpus, preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref), rtol=1e-5, atol=1e-6)
    ref_segmax = np.asarray(ref).reshape(q, n // SEG, SEG).max(axis=2)
    np.testing.assert_allclose(np.asarray(segmax_t).T, ref_segmax, rtol=1e-5, atol=1e-6)


def test_pallas_segmented_topk_exact(rng):
    q, n, d, k = 8, 16384, 128, 10
    queries = jnp.asarray(_unit(rng, q, d))
    corpus = jnp.asarray(_unit(rng, n, d))
    v, i = pallas_segmented_topk(queries, corpus, k, num_segments=16, block_n=2048)
    ref = jnp.einsum("qd,nd->qn", queries, corpus, preferred_element_type=jnp.float32)
    rv, ri = jax.lax.top_k(ref, k)
    np.testing.assert_allclose(np.asarray(v), np.asarray(rv), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_shape_validation(rng):
    import pytest

    queries = jnp.zeros((4, 128), jnp.float32)
    corpus = jnp.zeros((1000, 128), jnp.float32)  # not divisible
    with pytest.raises(ValueError, match="must divide"):
        fused_score_segmax(queries, corpus, block_n=2048)


def test_hybrid_pallas_branch_masks_freed_slots(rng):
    """The engine's fused pallas branch (slab >= 64k, multiple of 16384)
    must keep exactness with freed slots — the segment maxima are masked
    INSIDE the kernel (unmasked maxima could elevate garbage segments)."""
    from rust_local_rag_tpu.ops.hybrid import hybrid_topk

    n, d, q, k = 65536, 16, 2, 6
    corpus = _unit(rng, n, d)
    queries = corpus[:q].copy()
    mask = np.ones(n, dtype=bool)
    mask[1] = False  # free a slot adjacent to a top hit
    lex_slots = np.full((q, 512), -1, np.int32)
    lex_vals = np.zeros((q, 512), np.float32)
    v, e, l, i = hybrid_topk(
        jnp.asarray(queries), jnp.asarray(corpus), jnp.asarray(mask),
        jnp.asarray(lex_slots), jnp.asarray(lex_vals),
        jnp.float32(1.0), jnp.float32(0.0), k,
    )
    i = np.asarray(i)
    ref = queries @ corpus.T
    ref[:, 1] = -np.inf
    for qi in range(q):
        want = set(np.argsort(-ref[qi])[:k].tolist())
        assert set(i[qi].tolist()) == want


def test_auto_block_n_budget():
    """Tile auto-selection: full 2048 tiles up to Q=256 (bf16), shrinking
    beyond so the double-buffered pipeline stays inside the 16 MB
    scoped-VMEM budget (measured OOM boundary on v5e: Q=512 @ blk=2048)."""
    from rust_local_rag_tpu.ops.pallas_topk import auto_block_n

    assert auto_block_n(128, 768, 2) == 2048
    assert auto_block_n(256, 768, 2) == 2048
    assert auto_block_n(512, 768, 2) == 1024
    # beyond the supported batch no tile fits -> None (caller falls back)
    assert auto_block_n(4096, 768, 2) is None
    # f32 slabs pay the multi-pass dot surcharge: Q=512 has no fit
    assert auto_block_n(512, 768, 4) is None
    # f32 slabs halve the corpus-tile budget share
    assert auto_block_n(128, 768, 4) <= 2048
    # every in-budget choice respects the budget
    for q in (8, 64, 128, 512):
        blk = auto_block_n(q, 768, 2)
        assert 2 * (blk * 768 * 2 + q * blk * 4) + q * 768 * 2 <= 14 * 1024 * 1024


def test_fused_score_segmax_auto_block(rng):
    """block_n=None (auto) path produces identical outputs."""
    q, n, d = 8, 16384, 256
    queries = jnp.asarray(_unit(rng, q, d))
    corpus = jnp.asarray(_unit(rng, n, d))
    s_auto, m_auto = fused_score_segmax(queries, corpus)
    s_fix, m_fix = fused_score_segmax(queries, corpus, block_n=2048)
    np.testing.assert_allclose(np.asarray(s_auto), np.asarray(s_fix))
    np.testing.assert_allclose(np.asarray(m_auto), np.asarray(m_fix))
