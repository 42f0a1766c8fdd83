"""Dense similarity math, TPU-first.

Semantics mirror the reference's CPU loops exactly (so recall@k is bit-exact
against the Rust brute force at f32):

  * normalize      — rag_engine.rs:1763-1771 (skip when ||v||^2 <= 1e-20)
  * cosine         — rag_engine.rs:1742-1759 (eps 1e-10, clamp [-1,1])
  * dense scoring  — rag_engine.rs:524-541 (dot product of normalized vecs)
  * hybrid blend   — rag_engine.rs:515-532 (lexical normalized by per-query
                     max, floored at f32::EPSILON)

The shapes are batched: queries [Q, D] against a corpus [N, D] resident in
HBM, scored as one MXU matmul (`q @ c.T`) with f32 accumulation — there is no
per-candidate loop anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# f32::EPSILON in Rust — the lexical max floor (rag_engine.rs:515-519).
F32_EPSILON = 1.1920929e-07


def normalize(v: jax.Array) -> jax.Array:
    """Normalize a single vector to unit length.

    Leaves the vector unchanged when ||v||^2 <= 1e-20, matching the
    reference's in-place normalize (rag_engine.rs:1763-1771).
    """
    norm_sq = jnp.sum(v.astype(jnp.float32) ** 2)
    norm = jnp.sqrt(norm_sq)
    return jnp.where(norm_sq > 1e-20, v / norm.astype(v.dtype), v)


def normalize_rows(m: jax.Array) -> jax.Array:
    """Row-wise unit normalization of an [N, D] matrix (same skip rule)."""
    norm_sq = jnp.sum(m.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    norm = jnp.sqrt(norm_sq)
    return jnp.where(norm_sq > 1e-20, m / norm.astype(m.dtype), m)


def cosine_similarity(a: jax.Array, b: jax.Array) -> jax.Array:
    """Cosine similarity with the reference's edge-case semantics:
    0.0 for near-zero norms (eps 1e-10), result clamped to [-1, 1]
    (rag_engine.rs:1742-1759). Length mismatch is a host-side error here
    (static shapes), unlike the reference's runtime 0.0.
    """
    eps = 1e-10
    a32 = a.astype(jnp.float32)
    b32 = b.astype(jnp.float32)
    dot = jnp.sum(a32 * b32)
    norm_a = jnp.sqrt(jnp.sum(a32 * a32))
    norm_b = jnp.sqrt(jnp.sum(b32 * b32))
    cos = jnp.clip(dot / (norm_a * norm_b), -1.0, 1.0)
    return jnp.where((norm_a < eps) | (norm_b < eps), 0.0, cos)


def dense_scores(
    queries: jax.Array,
    corpus: jax.Array,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """[Q, D] x [N, D] -> [Q, N] dot-product scores, f32 accumulation.

    Both sides are assumed unit-normalized (the engine normalizes on ingest
    and on load, as the reference does at rag_engine.rs:359,1678-1680), so
    this is cosine similarity on the MXU.
    """
    return jnp.einsum(
        "qd,nd->qn",
        queries,
        corpus,
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def blend_scores(
    embedding_scores: jax.Array,
    lexical_scores: jax.Array,
    embedding_weight: float,
    lexical_weight: float,
) -> jax.Array:
    """combined = w_e * emb + w_l * (lex / max(lex)) per query.

    `lexical_scores` are raw BM25 values aligned to the same candidate axis
    (0.0 where a chunk had no lexical hit). The per-query max is floored at
    f32::EPSILON exactly like the reference (rag_engine.rs:515-532).
    Shapes: [Q, N] both, or [N] both.
    """
    lex = lexical_scores.astype(jnp.float32)
    max_lex = jnp.maximum(jnp.max(lex, axis=-1, keepdims=True), F32_EPSILON)
    lex_norm = lex / max_lex
    return (
        embedding_weight * embedding_scores.astype(jnp.float32)
        + lexical_weight * lex_norm
    )
