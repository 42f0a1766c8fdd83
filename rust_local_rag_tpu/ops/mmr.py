"""Maximal Marginal Relevance diversification as one device program.

The reference runs MMR as a greedy host loop over Vec<f32> embeddings
(rag_engine.rs:767-839). Here the whole greedy selection is a single
lax.fori_loop on device — k iterations, each one masked argmax + one
[P, D] x [D] matvec — so there are no host round-trips between steps.

Semantics preserved exactly:
  * MMR(i) = (1 - λ) * relevance_i - λ * max_sim_to_selected_i
    (rag_engine.rs:808-809)
  * max similarity starts from a 0.0 floor (fold(0.0, max) at :800-804),
    so negative similarities never reward a candidate;
  * non-finite similarities are excluded from the max (:803);
  * candidates with non-finite relevance are skipped in MMR steps (:794-797);
  * the first selection is always the highest-ranked candidate, without a
    finiteness check — swap_remove(0) at :782-784;
  * selection stops early when no finite-scored candidate remains (:819-821)
    — on device, the unused tail of the output carries index -1.

Tie-break: first (lowest) index wins. The reference's tie order depends on
its swap_remove shuffling, i.e. is effectively arbitrary; ours is
deterministic.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

NEG_INF = float("-inf")  # python float: trace-safe module constant (see ops/topk.py)


@jax.jit
def similarity_matrices(embeddings: jax.Array) -> jax.Array:
    """[Q, P, D] -> [Q, P, P] pairwise dot products for a BATCH of MMR
    candidate pools in one device call (the batched search path feeds all
    queries' pools together; one dispatch instead of Q)."""
    return jnp.einsum(
        "qpd,qrd->qpr",
        embeddings,
        embeddings,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@jax.jit
def similarity_matrix(embeddings: jax.Array) -> jax.Array:
    """[P, D] -> [P, P] pairwise dot products (one MXU matmul, f32).

    The split-execution MMR path: the device does the O(P^2 D) work in one
    fused matmul; the O(k P) greedy argmax scan — trivially sequential and
    tiny — runs on host over this matrix (mmr_select_host). One device->host
    transfer of ~P^2 floats, no per-step round trips.
    """
    return jnp.einsum(
        "pd,qd->pq",
        embeddings,
        embeddings,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def mmr_select_host(
    sims: np.ndarray,
    relevance: np.ndarray,
    k: int,
    diversity_factor: float,
) -> list:
    """Greedy MMR over a precomputed similarity matrix — identical semantics
    to mmr_select (and to rag_engine.rs:767-839), with deterministic
    first-index tie-breaking. Returns selected indices in order."""
    p = sims.shape[0]
    if p == 0:
        return []
    lam = float(diversity_factor)
    rel = np.asarray(relevance, dtype=np.float32)

    selected = [0]  # swap_remove(0): unconditional first pick
    picked = np.zeros(p, dtype=bool)
    picked[0] = True
    max_sim = np.where(np.isfinite(sims[0]), sims[0], 0.0)
    max_sim = np.maximum(max_sim, 0.0)  # fold(0.0, max) floor

    while len(selected) < k:
        mmr = (1.0 - lam) * rel - lam * max_sim
        mmr[picked | ~np.isfinite(rel) | ~np.isfinite(mmr)] = -math.inf
        best = int(np.argmax(mmr))
        if mmr[best] == -math.inf:
            break
        selected.append(best)
        picked[best] = True
        row = np.where(np.isfinite(sims[best]), sims[best], 0.0)
        max_sim = np.maximum(max_sim, row)
    return selected


@functools.partial(jax.jit, static_argnames=("k",))
def mmr_select_batch(
    embeddings: jax.Array,   # [Q, P, D]
    relevance: jax.Array,    # [Q, P]
    k: int,
    diversity_factor: jax.Array | float,
    valid_counts: jax.Array,  # [Q]
) -> jax.Array:
    """Batched fully-on-device MMR: vmapped greedy loops, one dispatch,
    [Q, k] indices out. The batched search path uses this so only ~Q*k
    int32s cross the device boundary (fetching the [Q, P, P] similarity
    matrices instead costs tens of MB — seconds through a TPU tunnel)."""
    lam = jnp.float32(diversity_factor)
    return jax.vmap(
        lambda e, r, v: mmr_select.__wrapped__(e, r, k, lam, valid_count=v)
    )(embeddings, relevance, valid_counts)


@functools.partial(jax.jit, static_argnames=("k",))
def mmr_select(
    embeddings: jax.Array,
    relevance: jax.Array,
    k: int,
    diversity_factor: jax.Array | float,
    valid_count: jax.Array | None = None,
) -> jax.Array:
    """Greedy MMR selection.

    Args:
        embeddings: [P, D] candidate embeddings (unit-normalized), already
            ordered by descending relevance (the engine feeds search output).
        relevance: [P] relevance scores (the blended search scores).
        k: number of selections (static). k may exceed P; surplus slots
            return -1.
        diversity_factor: λ in [0, 1].
        valid_count: optional scalar — candidates at index >= valid_count are
            padding and never selected.

    Returns:
        [k] int32 indices into the candidate axis, -1 for unused slots.
    """
    p = embeddings.shape[0]
    lam = jnp.float32(diversity_factor)
    rel = relevance.astype(jnp.float32)

    if valid_count is None:
        pos_valid = jnp.ones((p,), dtype=bool)
    else:
        pos_valid = jnp.arange(p, dtype=jnp.int32) < valid_count
    n_pos = jnp.sum(pos_valid.astype(jnp.int32))
    mmr_valid = pos_valid & jnp.isfinite(rel)

    # NOTE: the loop body is pure masked arithmetic — no lax.cond. Branchy
    # bodies compile pathologically slowly on some TPU compile services
    # (observed 450 s for a cond-based variant vs ~1 s for this one); the
    # predicated form also maps better onto the VPU.
    def body(i, state):
        selected, max_sim, out, count = state

        # MMR pick (used for i > 0)
        mmr = (1.0 - lam) * rel - lam * max_sim
        mmr = jnp.where(mmr_valid & ~selected & jnp.isfinite(mmr), mmr, NEG_INF)
        best_mmr = jnp.argmax(mmr).astype(jnp.int32)
        ok_mmr = jnp.max(mmr) > NEG_INF

        # First pick (i == 0): swap_remove(0) — the top-ranked candidate,
        # unconditionally (no finiteness check).
        first = jnp.argmax(pos_valid).astype(jnp.int32)

        is_first = i == 0
        best = jnp.where(is_first, first, best_mmr)
        ok = jnp.where(is_first, n_pos > 0, ok_mmr)
        # Once a step fails, every later step fails too (early break).
        ok = ok & (count == i)

        # One-hot select of the chosen row (matmul instead of a dynamic
        # gather, and iota-compare instead of dynamic scatters — scatters
        # with traced indices compile very slowly on some TPU toolchains).
        p_iota = jax.lax.broadcasted_iota(jnp.int32, (p,), 0)
        one_hot = (p_iota == best).astype(jnp.float32)
        chosen = jnp.einsum(
            "p,pd->d",
            one_hot,
            embeddings.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        sims = jnp.einsum(
            "pd,d->p",
            embeddings,
            chosen,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        sims = jnp.where(jnp.isfinite(sims), sims, 0.0)

        selected = selected | ((p_iota == best) & ok)
        max_sim = jnp.where(ok, jnp.maximum(max_sim, sims), max_sim)
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (out.shape[0],), 0)
        out = jnp.where((k_iota == i) & ok, best, out)
        count = count + jnp.where(ok, 1, 0).astype(jnp.int32)
        return selected, max_sim, out, count

    init = (
        jnp.zeros((p,), dtype=bool),
        jnp.zeros((p,), dtype=jnp.float32),  # fold(0.0, max) floor
        jnp.full((k,), -1, dtype=jnp.int32),
        jnp.int32(0),
    )
    _, _, out, _ = jax.lax.fori_loop(0, k, body, init)
    return out
