"""Exact top-k over an HBM-resident corpus, without materializing [Q, N].

This is the TPU-native replacement for the reference's per-candidate scoring
loop + sort (rag_engine.rs:522-561) and for its LSH AnnIndex
(rag_engine.rs:1901-2081): at TPU speed, EXACT brute force beats approximate
LSH, so the ANN structure is deleted and exact-search semantics are the
product (BASELINE.json north star).

Two paths:
  * exact_topk      — one [Q,N] matmul + lax.top_k; fine for small corpora.
  * streaming_topk  — lax.scan over corpus tiles, merging a running top-k in
                      on-chip memory. The [Q,N] score matrix never exists in
                      HBM, so the pass is bounded by reading the corpus once
                      (HBM speed-of-light). Exact: each tile contributes its
                      full score set to the merge.

Tie-breaking: lax.top_k prefers the lower index, which is deterministic
(the reference's sort on HashMap iteration order was not).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")  # PYTHON float, deliberately not jnp.float32(-inf):
# a module-level device array materializes as a TRACER if the module's
# first import happens inside a traced function (measured: encoder_forward
# lazily imported ops.attention -> ops/__init__ -> this module during a
# jit trace, permanently corrupting the constant and crashing every later
# shard_map with "Shouldn't have any non-shard_map tracers")


def exact_topk(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
):
    """[Q,D] x [N,D] -> (values [Q,k], indices [Q,k]) by descending score."""
    scores = jnp.einsum(
        "qd,nd->qn",
        queries,
        corpus,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return jax.lax.top_k(scores, k)


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "precision"))
def streaming_topk(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    tile_n: int = 65536,
    valid_count: jax.Array | None = None,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
):
    """Exact top-k with a tiled scan over the corpus rows.

    Args:
        queries: [Q, D] unit-normalized query block.
        corpus:  [N, D] corpus matrix (N padded to a multiple of tile_n is
                 handled internally by masking).
        k:       number of results per query (static).
        tile_n:  corpus rows per scan step (static).
        valid_count: optional scalar — rows >= valid_count are masked to
                 -inf (slab stores pad capacity; see engine/chunk_store.py).

    Returns:
        (values [Q, k] f32, indices [Q, k] int32), sorted descending.
    """
    q, d = queries.shape
    n = corpus.shape[0]
    if n <= tile_n:
        scores = jnp.einsum(
            "qd,nd->qn",
            queries,
            corpus,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        if valid_count is not None:
            col = jax.lax.broadcasted_iota(jnp.int32, (q, n), 1)
            scores = jnp.where(col < valid_count, scores, NEG_INF)
        kk = min(k, n)
        vals, idx = jax.lax.top_k(scores, kk)
        if kk < k:  # pad to the requested k with -inf sentinels
            vals = jnp.pad(vals, ((0, 0), (0, k - kk)), constant_values=NEG_INF)
            idx = jnp.pad(idx, ((0, 0), (0, k - kk)), constant_values=n)
        return vals, idx.astype(jnp.int32)

    num_tiles = -(-n // tile_n)
    pad = num_tiles * tile_n - n
    if pad:
        corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
    tiles = corpus.reshape(num_tiles, tile_n, d)

    limit = jnp.int32(n if valid_count is None else valid_count)

    def step(carry, tile):
        run_vals, run_idx, tile_no = carry
        scores = jnp.einsum(
            "qd,nd->qn",
            queries,
            tile,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        base = tile_no * tile_n
        col = base + jax.lax.broadcasted_iota(jnp.int32, (q, tile_n), 1)
        scores = jnp.where(col < limit, scores, NEG_INF)
        # Reduce the tile to its local top-k first (cheaper merge), then
        # merge with the running top-k. Both are exact.
        kk = min(k, tile_n)
        tv, ti = jax.lax.top_k(scores, kk)
        ti = base + ti.astype(jnp.int32)
        all_vals = jnp.concatenate([run_vals, tv], axis=1)
        all_idx = jnp.concatenate([run_idx, ti], axis=1)
        mv, sel = jax.lax.top_k(all_vals, k)
        mi = jnp.take_along_axis(all_idx, sel, axis=1)
        return (mv, mi, tile_no + 1), None

    init_vals = jnp.full((q, k), NEG_INF, dtype=jnp.float32)
    init_idx = jnp.full((q, k), n, dtype=jnp.int32)
    (vals, idx, _), _ = jax.lax.scan(
        step, (init_vals, init_idx, jnp.int32(0)), tiles
    )
    return vals, idx
