"""Fused first-stage hybrid retrieval: dense scores + BM25 blend + top-k in
one device program.

This is the boxed hot region of the reference's search call stack
(SURVEY.md §3.2, rag_engine.rs:515-561) as a single XLA computation:

    emb    = q @ corpus.T                       (MXU)
    lex'   = lex / max(lex, f32::EPSILON)       (VPU)
    comb   = w_e * emb + w_l * lex'             (VPU, fused)
    top-k over masked slots                     (on-chip)

Returns the per-candidate score breakdown (combined, embedding, normalized
lexical) that the reference carries through SearchCandidate
(rag_engine.rs:134-150) for result transparency.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)


@functools.partial(jax.jit, static_argnames=("k",))
def hybrid_topk(
    queries: jax.Array,      # [Q, D] unit-normalized
    corpus: jax.Array,       # [N, D] slab (padded/holed)
    valid_mask: jax.Array,   # [N] bool
    lex_dense: jax.Array,    # [Q, N] raw BM25 scattered to slots (0 elsewhere)
    w_embedding: jax.Array,  # scalar
    w_lexical: jax.Array,    # scalar
    k: int,
):
    """-> (combined [Q,k], embedding [Q,k], lexical_norm [Q,k], idx [Q,k]).

    Invalid slots get -inf combined scores; if fewer than k valid slots
    exist the tail carries -inf/-1 sentinels.
    """
    emb = jnp.einsum(
        "qd,nd->qn",
        queries,
        corpus,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    lex = lex_dense.astype(jnp.float32)
    # per-query max over candidates, floored at f32::EPSILON
    # (rag_engine.rs:515-519)
    max_lex = jnp.maximum(
        jnp.max(lex, axis=-1, keepdims=True), jnp.float32(1.1920929e-07)
    )
    lex_norm = lex / max_lex
    combined = w_embedding * emb + w_lexical * lex_norm

    masked = jnp.where(valid_mask[None, :], combined, NEG_INF)
    k_eff = min(k, corpus.shape[0])
    if corpus.shape[0] >= 65536:
        # large slab: segmented exact selection beats XLA's full sort ~4x
        from rust_local_rag_tpu.ops.fast_topk import (
            segmented_exact_topk_scores,
        )

        vals, idx = segmented_exact_topk_scores.__wrapped__(masked, k_eff)
    else:
        vals, idx = jax.lax.top_k(masked, k_eff)
    if k_eff < k:
        q = queries.shape[0]
        vals = jnp.pad(vals, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF)
        idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)), constant_values=-1)

    emb_k = jnp.take_along_axis(emb, jnp.maximum(idx, 0), axis=1)
    lex_k = jnp.take_along_axis(lex_norm, jnp.maximum(idx, 0), axis=1)
    invalid = vals == NEG_INF
    idx = jnp.where(invalid, -1, idx)
    return vals, emb_k, lex_k, idx.astype(jnp.int32)
