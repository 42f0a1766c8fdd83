"""Sharded search + distributed training over the 8-device virtual CPU mesh,
verified against the single-device oracle (SURVEY.md §4 multi-node plan)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rust_local_rag_tpu.parallel.mesh import build_mesh
from rust_local_rag_tpu.parallel.sharded_search import (
    replicate,
    shard_corpus,
    sharded_topk,
)
from rust_local_rag_tpu.ops.topk import streaming_topk


def _unit_rows(rng, n, d):
    m = rng.standard_normal((n, d)).astype(np.float32)
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def test_mesh_construction():
    mesh = build_mesh()
    assert mesh.shape["corpus"] == 8
    mesh2 = build_mesh((2, 4), ("data", "corpus"))
    assert mesh2.shape["data"] == 2
    assert mesh2.shape["corpus"] == 4
    with pytest.raises(ValueError):
        build_mesh((3,), ("corpus",))


def test_sharded_topk_exact_vs_single_device(rng):
    d, n, q, k = 32, 1024, 4, 16
    corpus = _unit_rows(rng, n, d)
    queries = _unit_rows(rng, q, d)
    mesh = build_mesh()
    c_sharded = shard_corpus(jnp.asarray(corpus), mesh)
    q_rep = replicate(jnp.asarray(queries), mesh)

    vals, idx = sharded_topk(q_rep, c_sharded, k, mesh, tile_n=64)
    vals, idx = np.asarray(vals), np.asarray(idx)

    ref_v, ref_i = streaming_topk(jnp.asarray(queries), jnp.asarray(corpus), k, tile_n=256)
    ref_v, ref_i = np.asarray(ref_v), np.asarray(ref_i)

    # exact recall parity: identical index sets AND identical score ordering
    for qi in range(q):
        assert set(idx[qi].tolist()) == set(ref_i[qi].tolist())
        np.testing.assert_allclose(vals[qi], ref_v[qi], rtol=1e-6, atol=1e-7)


def test_sharded_topk_with_padding_mask(rng):
    d, n_valid, k = 16, 700, 8
    n_padded = 704  # multiple of 8 shards
    corpus = np.zeros((n_padded, d), dtype=np.float32)
    corpus[:n_valid] = _unit_rows(rng, n_valid, d)
    # make padded tail maximally attractive to prove masking works
    corpus[n_valid:] = corpus[0]
    queries = corpus[:2].copy()
    mesh = build_mesh()

    vals, idx = sharded_topk(
        replicate(jnp.asarray(queries), mesh),
        shard_corpus(jnp.asarray(corpus), mesh),
        k,
        mesh,
        tile_n=64,
        valid_count=jnp.int32(n_valid),
    )
    idx = np.asarray(idx)
    assert idx.max() < n_valid

    ref_v, ref_i = streaming_topk(
        jnp.asarray(queries), jnp.asarray(corpus), k, tile_n=256,
        valid_count=jnp.int32(n_valid),
    )
    for qi in range(2):
        assert set(idx[qi].tolist()) == set(np.asarray(ref_i)[qi].tolist())


def test_sharded_topk_k_too_large_rejected(rng):
    mesh = build_mesh()
    corpus = jnp.asarray(_unit_rows(rng, 64, 8))  # 8 rows/shard
    queries = jnp.asarray(_unit_rows(rng, 1, 8))
    with pytest.raises(ValueError, match="exceeds rows per shard"):
        sharded_topk(queries, corpus, 9, mesh)


def test_sharded_topk_uneven_rejected(rng):
    mesh = build_mesh()
    corpus = jnp.asarray(_unit_rows(rng, 100, 8))  # not divisible by 8
    queries = jnp.asarray(_unit_rows(rng, 1, 8))
    with pytest.raises(ValueError, match="divide evenly"):
        sharded_topk(queries, corpus, 4, mesh)


def test_distributed_train_step_runs_and_learns():
    from rust_local_rag_tpu.models.encoder import (
        EncoderConfig,
        init_encoder_params,
    )
    from rust_local_rag_tpu.parallel.train import (
        make_train_step,
        place_batch,
        shard_params,
    )

    cfg = EncoderConfig(
        vocab_size=256, dim=32, depth=2, heads=2, ffn_dim=64, max_len=16,
        activation_dtype="float32",
    )
    mesh = build_mesh((4, 2), ("data", "model"))
    params = shard_params(init_encoder_params(jax.random.PRNGKey(0), cfg), mesh, cfg)
    step = make_train_step(mesh, cfg, lr=1e-2)

    rng = np.random.default_rng(0)
    B, L = 8, 16
    q_ids = rng.integers(4, 256, (B, L)).astype(np.int32)
    p_ids = q_ids.copy()  # positives = same text -> loss should drop fast
    mask = np.ones((B, L), dtype=np.int32)
    batch = place_batch(
        (jnp.asarray(q_ids), jnp.asarray(mask), jnp.asarray(p_ids), jnp.asarray(mask)),
        mesh,
    )

    losses = []
    for _ in range(3):
        params, loss = step(params, *batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # learning signal flows through the mesh


def test_train_params_actually_sharded():
    from rust_local_rag_tpu.models.encoder import (
        EncoderConfig,
        init_encoder_params,
    )
    from rust_local_rag_tpu.parallel.train import shard_params

    cfg = EncoderConfig(
        vocab_size=256, dim=32, depth=1, heads=2, ffn_dim=64, max_len=16,
        activation_dtype="float32",
    )
    mesh = build_mesh((4, 2), ("data", "model"))
    params = shard_params(init_encoder_params(jax.random.PRNGKey(0), cfg), mesh, cfg)
    # FFN gate is sharded over "model" on its hidden dim
    sh = params["layers"][0]["w_gate"].sharding
    assert sh.spec == jax.sharding.PartitionSpec(None, "model")
    # norms replicated
    assert params["final_norm"].sharding.spec == jax.sharding.PartitionSpec()


def test_sharded_topk_large_shard_segmented_path(rng):
    """Exercise the segmented local-selection branch (rows/shard >= 64k)."""
    d, k = 16, 8
    n = 8 * 65536  # 64k rows per shard on the 8-way mesh
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = corpus[:2].copy()
    mesh = build_mesh()
    vals, idx = sharded_topk(
        replicate(jnp.asarray(queries), mesh),
        shard_corpus(jnp.asarray(corpus), mesh),
        k,
        mesh,
    )
    vals, idx = np.asarray(vals), np.asarray(idx)
    assert (idx[:, 0] == np.arange(2)).all()
    np.testing.assert_allclose(vals[:, 0], 1.0, atol=1e-5)
    ref = queries @ corpus.T
    for qi in range(2):
        want = set(np.argsort(-ref[qi])[:k].tolist())
        assert set(idx[qi].tolist()) == want


# ---- multi-slice hierarchical merge (ICI + DCN; SURVEY.md §5.8) ----


def test_multislice_topk_exact_vs_single_device(rng):
    from rust_local_rag_tpu.parallel.multislice import multislice_topk

    d, n, q, k = 32, 1024, 4, 16
    corpus = _unit_rows(rng, n, d)
    queries = _unit_rows(rng, q, d)
    mesh = build_mesh((2, 4), ("slice", "ici"))
    vals, idx = multislice_topk(
        jnp.asarray(queries), jnp.asarray(corpus), k, mesh, tile_n=64
    )
    vals, idx = np.asarray(vals), np.asarray(idx)
    ref_v, ref_i = jax.lax.top_k(
        jnp.einsum(
            "qd,nd->qn", jnp.asarray(queries), jnp.asarray(corpus),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ),
        k,
    )
    for qi in range(q):
        assert set(idx[qi].tolist()) == set(np.asarray(ref_i)[qi].tolist())
        np.testing.assert_allclose(
            vals[qi], np.asarray(ref_v)[qi], rtol=1e-6, atol=1e-7
        )


def test_multislice_topk_padding_and_bounds(rng):
    from rust_local_rag_tpu.parallel.multislice import multislice_topk

    mesh = build_mesh((2, 4), ("slice", "ici"))
    d, n_valid, n_padded, k = 16, 700, 704, 8
    corpus = np.zeros((n_padded, d), np.float32)
    corpus[:n_valid] = _unit_rows(rng, n_valid, d)
    queries = _unit_rows(rng, 3, d)
    vals, idx = multislice_topk(
        jnp.asarray(queries), jnp.asarray(corpus), k, mesh,
        tile_n=64, valid_count=n_valid,
    )
    # no padded row may appear
    assert np.asarray(idx).max() < n_valid
    ref_v, _ = jax.lax.top_k(
        jnp.einsum(
            "qd,nd->qn", jnp.asarray(queries),
            jnp.asarray(corpus[:n_valid]),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ),
        k,
    )
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(ref_v), rtol=1e-6, atol=1e-7
    )

    # fewer live rows than k: the -inf filler entries that reach the merged
    # top-k must carry idx=-1 (same invariant as sharded_hybrid_topk), not
    # arbitrary clamped slab rows
    few = 3
    vals2, idx2 = multislice_topk(
        jnp.asarray(queries), jnp.asarray(corpus), k, mesh,
        tile_n=64, valid_count=few,
    )
    vals2, idx2 = np.asarray(vals2), np.asarray(idx2)
    assert (idx2[:, few:] == -1).all()
    assert np.isneginf(vals2[:, few:]).all()
    assert (idx2[:, :few] >= 0).all() and (idx2[:, :few] < few).all()

    with pytest.raises(ValueError, match="exceeds rows per shard"):
        multislice_topk(
            jnp.asarray(queries), jnp.asarray(corpus), 128, mesh
        )
    with pytest.raises(ValueError, match="divide evenly"):
        multislice_topk(
            jnp.asarray(queries), jnp.asarray(corpus[:701]), k, mesh
        )
