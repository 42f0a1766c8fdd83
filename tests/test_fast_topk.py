"""segmented_exact_topk: exactness vs lax.top_k, including adversarial
clustered distributions and degenerate shapes."""

import numpy as np
import jax
import jax.numpy as jnp

from rust_local_rag_tpu.ops.fast_topk import (
    segmented_exact_topk,
    segmented_exact_topk_scores,
)


def _unit(rng, n, d):
    m = rng.standard_normal((n, d)).astype(np.float32)
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def test_matches_lax_topk_random(rng):
    q, n, k = 4, 5000, 10
    scores = rng.standard_normal((q, n)).astype(np.float32)
    v, i = segmented_exact_topk_scores(
        jnp.asarray(scores), k, segment_size=64, num_segments=32
    )
    rv, ri = jax.lax.top_k(jnp.asarray(scores), k)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_all_topk_in_one_segment(rng):
    """Adversarial: the entire true top-k packed into a single segment."""
    q, n, k, t = 2, 4096, 16, 64
    scores = rng.uniform(-1.0, 0.0, (q, n)).astype(np.float32)
    scores[:, 256 : 256 + k] = np.linspace(5.0, 4.0, k, dtype=np.float32)
    v, i = segmented_exact_topk_scores(
        jnp.asarray(scores), k, segment_size=t, num_segments=k
    )
    rv, ri = jax.lax.top_k(jnp.asarray(scores), k)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_topk_spread_one_per_segment(rng):
    """Adversarial: exactly one top element per segment (max spread)."""
    q, t, nt, k = 1, 64, 64, 32
    n = t * nt
    scores = rng.uniform(-1.0, 0.0, (q, n)).astype(np.float32)
    for j in range(k):
        scores[0, j * t + 7] = 10.0 - j * 0.01
    v, i = segmented_exact_topk_scores(
        jnp.asarray(scores), k, segment_size=t, num_segments=k
    )
    rv, ri = jax.lax.top_k(jnp.asarray(scores), k)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_non_divisible_n_padding(rng):
    q, n, k = 3, 1000, 8  # 1000 % 64 != 0
    scores = rng.standard_normal((q, n)).astype(np.float32)
    v, i = segmented_exact_topk_scores(
        jnp.asarray(scores), k, segment_size=64, num_segments=16
    )
    rv, ri = jax.lax.top_k(jnp.asarray(scores), k)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
    assert np.asarray(i).max() < n


def test_degenerate_small_corpus(rng):
    # selection covers everything -> plain top_k path
    q, n, k = 2, 100, 5
    scores = rng.standard_normal((q, n)).astype(np.float32)
    v, i = segmented_exact_topk_scores(
        jnp.asarray(scores), k, segment_size=64, num_segments=256
    )
    rv, ri = jax.lax.top_k(jnp.asarray(scores), k)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_fused_queries_corpus(rng):
    q, n, d, k = 3, 3000, 32, 12
    queries = _unit(rng, q, d)
    corpus = _unit(rng, n, d)
    v, i = segmented_exact_topk(
        jnp.asarray(queries), jnp.asarray(corpus), k,
        segment_size=64, num_segments=32,
    )
    ref = queries @ corpus.T
    for qi in range(q):
        want_idx = np.argsort(-ref[qi], kind="stable")[:k]
        assert set(np.asarray(i)[qi].tolist()) == set(want_idx.tolist())
        np.testing.assert_allclose(
            np.asarray(v)[qi], np.sort(ref[qi])[::-1][:k], rtol=1e-5, atol=1e-6
        )


def test_num_segments_raised_to_k(rng):
    # num_segments < k must still be exact (implementation raises S to k)
    q, n, k = 1, 8192, 64
    scores = rng.standard_normal((q, n)).astype(np.float32)
    v, i = segmented_exact_topk_scores(
        jnp.asarray(scores), k, segment_size=64, num_segments=8
    )
    rv, ri = jax.lax.top_k(jnp.asarray(scores), k)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))
