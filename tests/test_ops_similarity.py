"""Device similarity/top-k ops vs. the NumPy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from rust_local_rag_tpu.ops import (
    normalize,
    normalize_rows,
    cosine_similarity,
    dense_scores,
    blend_scores,
    exact_topk,
    streaming_topk,
)
import oracle


def test_normalize_matches_oracle(rng):
    for _ in range(5):
        v = rng.standard_normal(768).astype(np.float32) * rng.uniform(0.1, 10)
        got = np.asarray(normalize(jnp.asarray(v)))
        want = oracle.normalize(v)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_normalize_zero_vector_unchanged():
    v = np.zeros(16, dtype=np.float32)
    got = np.asarray(normalize(jnp.asarray(v)))
    np.testing.assert_array_equal(got, v)


def test_normalize_tiny_vector_unchanged():
    # ||v||^2 = 16e-22 < 1e-20 -> unchanged (reference guard)
    v = np.full(16, 1e-11, dtype=np.float32)
    got = np.asarray(normalize(jnp.asarray(v)))
    np.testing.assert_array_equal(got, v)


def test_normalize_rows(rng):
    m = rng.standard_normal((32, 64)).astype(np.float32)
    m[3] = 0.0  # zero row stays zero
    got = np.asarray(normalize_rows(jnp.asarray(m)))
    for i in range(32):
        np.testing.assert_allclose(got[i], oracle.normalize(m[i]), rtol=1e-6, atol=1e-7)


def test_cosine_similarity_cases(rng):
    a = rng.standard_normal(64).astype(np.float32)
    b = rng.standard_normal(64).astype(np.float32)
    got = float(cosine_similarity(jnp.asarray(a), jnp.asarray(b)))
    assert got == pytest.approx(oracle.cosine_similarity(a, b), rel=1e-5)
    # zero-norm -> 0.0
    z = np.zeros(64, dtype=np.float32)
    assert float(cosine_similarity(jnp.asarray(a), jnp.asarray(z))) == 0.0
    # identical -> clamped to <= 1.0
    assert float(cosine_similarity(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(1.0, abs=1e-6)


def test_dense_scores_matches_per_row_dot(rng):
    q = np.stack([oracle.normalize(rng.standard_normal(128).astype(np.float32)) for _ in range(4)])
    c = np.stack([oracle.normalize(rng.standard_normal(128).astype(np.float32)) for _ in range(50)])
    got = np.asarray(dense_scores(jnp.asarray(q), jnp.asarray(c)))
    want = q @ c.T
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_blend_scores_matches_oracle(rng):
    n = 40
    q = oracle.normalize(rng.standard_normal(64).astype(np.float32))
    c = np.stack([oracle.normalize(rng.standard_normal(64).astype(np.float32)) for _ in range(n)])
    lex = np.zeros(n, dtype=np.float32)
    lex[rng.choice(n, 10, replace=False)] = rng.uniform(0.5, 8.0, 10).astype(np.float32)

    emb = np.asarray(dense_scores(jnp.asarray(q[None]), jnp.asarray(c)))[0]
    got = np.asarray(
        blend_scores(jnp.asarray(emb[None]), jnp.asarray(lex[None]), 0.7, 0.3)
    )[0]

    want_rows = oracle.brute_force_search(q, c, lex, 0.7, 0.3, n)
    want = np.empty(n, dtype=np.float32)
    for idx, combined, _, _ in want_rows:
        want[idx] = combined
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_blend_scores_all_zero_lexical(rng):
    # max floored at f32::EPSILON -> no NaN, pure embedding ranking
    emb = rng.standard_normal((2, 10)).astype(np.float32)
    lex = np.zeros((2, 10), dtype=np.float32)
    got = np.asarray(blend_scores(jnp.asarray(emb), jnp.asarray(lex), 0.7, 0.3))
    np.testing.assert_allclose(got, 0.7 * emb, rtol=1e-6)


@pytest.mark.parametrize("n,tile", [(100, 64), (1000, 256), (257, 64)])
def test_streaming_topk_exact(rng, n, tile):
    d, q, k = 64, 3, 10
    queries = np.stack([oracle.normalize(rng.standard_normal(d).astype(np.float32)) for _ in range(q)])
    corpus = np.stack([oracle.normalize(rng.standard_normal(d).astype(np.float32)) for _ in range(n)])

    vals, idx = streaming_topk(jnp.asarray(queries), jnp.asarray(corpus), k, tile_n=tile)
    vals, idx = np.asarray(vals), np.asarray(idx)

    ref_scores = queries @ corpus.T
    for qi in range(q):
        want_idx = np.argsort(-ref_scores[qi], kind="stable")[:k]
        # identical index sets (exactness), identical ordering by score
        assert set(idx[qi].tolist()) == set(want_idx.tolist())
        np.testing.assert_allclose(vals[qi], np.sort(ref_scores[qi])[::-1][:k], rtol=1e-5, atol=1e-6)


def test_streaming_topk_valid_count_masks_tail(rng):
    d, n, k = 32, 128, 5
    corpus = np.stack([oracle.normalize(rng.standard_normal(d).astype(np.float32)) for _ in range(n)])
    # make the padded tail maximally attractive to prove it is masked
    query = corpus[n - 1][None, :]
    vals, idx = streaming_topk(
        jnp.asarray(query), jnp.asarray(corpus), k, tile_n=64, valid_count=jnp.int32(100)
    )
    assert np.asarray(idx).max() < 100
    ref = (query @ corpus[:100].T)[0]
    np.testing.assert_allclose(np.asarray(vals)[0], np.sort(ref)[::-1][:k], rtol=1e-5)


def test_streaming_topk_k_exceeds_n(rng):
    d, n, k = 16, 7, 12
    corpus = np.stack([oracle.normalize(rng.standard_normal(d).astype(np.float32)) for _ in range(n)])
    q = corpus[:1]
    vals, idx = streaming_topk(jnp.asarray(q), jnp.asarray(corpus), k, tile_n=4)
    vals, idx = np.asarray(vals)[0], np.asarray(idx)[0]
    assert np.sum(np.isfinite(vals)) == n
    assert (idx[np.isfinite(vals)] < n).all()


def test_exact_topk_agrees_with_streaming(rng):
    d, n, q, k = 32, 300, 2, 8
    queries = rng.standard_normal((q, d)).astype(np.float32)
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    v1, i1 = exact_topk(jnp.asarray(queries), jnp.asarray(corpus), k)
    v2, i2 = streaming_topk(jnp.asarray(queries), jnp.asarray(corpus), k, tile_n=128)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_module_constants_are_trace_safe():
    """Module-level device arrays become PERMANENT tracers if the module's
    first import happens inside a traced function (measured: encoder_forward
    lazily imported ops.attention -> ops/__init__ -> ops.topk during a jit
    trace, corrupting ops.topk.NEG_INF and crashing every later shard_map).
    All hot-path module constants must therefore be plain python scalars."""
    import importlib

    import jax

    mods = [
        "rust_local_rag_tpu.ops.topk",
        "rust_local_rag_tpu.ops.fast_topk",
        "rust_local_rag_tpu.ops.pallas_topk",
        "rust_local_rag_tpu.ops.hybrid",
        "rust_local_rag_tpu.ops.mmr",
        "rust_local_rag_tpu.parallel.sharded_search",
    ]
    for name in mods:
        m = importlib.import_module(name)
        assert isinstance(m.NEG_INF, float), (name, type(m.NEG_INF))
        for attr, v in vars(m).items():
            assert not isinstance(v, jax.Array), (
                f"{name}.{attr} is a module-level jax.Array — import-order "
                "tracing hazard (see ops/topk.py NEG_INF note)"
            )


def test_lazy_import_under_trace_does_not_corrupt_constants():
    """Reproduce the hazard end to end: force a FRESH import of ops.topk
    inside a jit trace, then verify its constants stayed concrete."""
    import importlib
    import sys

    import jax
    import jax.numpy as jnp

    saved = {
        k: sys.modules.pop(k)
        for k in list(sys.modules)
        if k.startswith("rust_local_rag_tpu.ops")
    }
    try:
        def traced(x):
            from rust_local_rag_tpu.ops import topk  # first import, traced

            return x + topk.NEG_INF

        out = jax.jit(traced)(jnp.float32(1.0))
        assert out == float("-inf")
        import rust_local_rag_tpu.ops.topk as topk

        assert isinstance(topk.NEG_INF, float)
    finally:
        sys.modules.update(saved)
        importlib.reload(importlib.import_module("rust_local_rag_tpu.ops.topk"))
