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

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)


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

    def body(i, state):
        selected, max_sim, out, count = state

        def pick_first(_):
            # swap_remove(0): take the top-ranked candidate unconditionally
            # (first positionally valid index; no finiteness check).
            first = jnp.argmax(pos_valid).astype(jnp.int32)
            return first, n_pos > 0

        def pick_mmr(_):
            mmr = (1.0 - lam) * rel - lam * max_sim
            mmr = jnp.where(
                mmr_valid & ~selected & jnp.isfinite(mmr), mmr, NEG_INF
            )
            best = jnp.argmax(mmr).astype(jnp.int32)
            return best, mmr[best] > NEG_INF

        best, ok = jax.lax.cond(i == 0, pick_first, pick_mmr, operand=None)
        # Once a step fails, every later step fails too (early break).
        ok = ok & (count == i)

        def apply(_):
            sel2 = selected.at[best].set(True)
            sims = jnp.einsum(
                "pd,d->p",
                embeddings,
                embeddings[best],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            sims = jnp.where(jnp.isfinite(sims), sims, 0.0)
            return sel2, jnp.maximum(max_sim, sims), out.at[i].set(best), count + 1

        def skip(_):
            return selected, max_sim, out, count

        return jax.lax.cond(ok, apply, skip, operand=None)

    init = (
        jnp.zeros((p,), dtype=bool),
        jnp.zeros((p,), dtype=jnp.float32),  # fold(0.0, max) floor
        jnp.full((k,), -1, dtype=jnp.int32),
        jnp.int32(0),
    )
    _, _, out, _ = jax.lax.fori_loop(0, k, body, init)
    return out
