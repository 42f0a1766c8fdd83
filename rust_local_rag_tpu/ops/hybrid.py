"""Fused first-stage hybrid retrieval: dense scores + BM25 blend + top-k in
one device program.

This is the boxed hot region of the reference's search call stack
(SURVEY.md §3.2, rag_engine.rs:515-561) as a single XLA computation.

The BM25 side arrives SPARSE — the host ships only the top-L (slot, score)
pairs (L = 512 >= top_k*5 at MAX_TOP_K; rag_engine.rs:505), never an
N-sized array. The blend is computed scatter-free via a union argument:

    combined = w_e * emb + w_l * lex_norm, with lex_norm >= 0 and nonzero
    on at most L slots. Boosts only move elements UP, so a non-boosted
    element's combined-rank is >= its embedding-rank. Hence the true
    combined top-k is contained in (embedding top-k) ∪ (lexical slots),
    and an exact top-k over that k+L-candidate union is exact overall.

That keeps the heavy selection on the pure-embedding scores (where the
segmented exact kernel applies) and reduces the blend to O(Q * (k + L))
work, with no dynamic scatters (which compile pathologically on some TPU
toolchains).

Returns the per-candidate score breakdown (combined, embedding, normalized
lexical) that the reference carries through SearchCandidate
(rag_engine.rs:134-150) for result transparency.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")  # python float: trace-safe module constant (see ops/topk.py)

# default sparse width for lexical hits: top_k*5 <= 500 (MAX_TOP_K = 100)
LEX_WIDTH = 512

# The MMR diversity path requests pool*5 lexical hits (pool <= 300 at
# MAX_TOP_K => 1500), which exceeds LEX_WIDTH; a wider bucket keeps parity
# with the reference's full pool*5 lexical list (rag_engine.rs:505) while
# bounding the number of compiled shapes to two.
LEX_WIDTH_BUCKETS = (LEX_WIDTH, 2048)


def _next_pow2(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


def lex_width_for(request: int) -> int:
    """Smallest lexical-width bucket covering `request` hits (capped at the
    largest bucket; requests beyond it are truncated, which only matters
    for direct engine callers exceeding MAX_TOP_K * 5 by >4x)."""
    for b in LEX_WIDTH_BUCKETS:
        if request <= b:
            return b
    return LEX_WIDTH_BUCKETS[-1]


@functools.partial(jax.jit, static_argnames=("k", "with_sims"))
def hybrid_topk(
    queries: jax.Array,      # [Q, D] unit-normalized
    corpus: jax.Array,       # [N, D] slab (padded/holed)
    valid_mask: jax.Array,   # [N] bool
    lex_slots: jax.Array,    # [Q, L] int32 slot of each BM25 hit (-1 = pad)
    lex_vals: jax.Array,     # [Q, L] f32 raw BM25 scores (0 on pads)
    w_embedding: jax.Array,  # scalar
    w_lexical: jax.Array,    # scalar
    k: int,
    with_sims: bool = False,
):
    """-> (combined [Q,k], embedding [Q,k], lexical_norm [Q,k], idx [Q,k]
    [, cand_sims [Q,k,k]]).

    with_sims=True additionally returns the pairwise similarity matrix of
    the k selected candidates (for MMR) inside the SAME device dispatch —
    a separate dispatch costs ~50 ms through a TPU tunnel.

    Invalid slots get -inf combined scores; if fewer than k valid slots
    exist the tail carries -inf/-1 sentinels.
    """
    qn = queries.shape[0]
    n = corpus.shape[0]
    L = lex_slots.shape[1]

    k_eff = min(k, n)
    from rust_local_rag_tpu.ops.pallas_topk import auto_block_n

    if (
        n >= 65536
        and n % 16384 == 0
        and auto_block_n(qn, queries.shape[1], corpus.dtype.itemsize)
        is not None
    ):
        # Pallas fused pass: scores + per-segment maxima in ONE read of the
        # corpus (the separate segment-max reduction would re-read the
        # [Q, N] score matrix from HBM). Masked slots are patched into both
        # outputs before selection. Very large query batches on f32 slabs
        # fall through to the XLA path below (auto_block_n returns None
        # when no corpus tile fits the scoped-VMEM budget).
        from rust_local_rag_tpu.ops.fast_topk import segmented_select_from
        from rust_local_rag_tpu.ops.pallas_topk import (
            fused_score_segmax_masked,
        )

        masked_emb, segmax_t = fused_score_segmax_masked(
            queries, corpus, valid_mask
        )
        e_vals, e_idx = segmented_select_from(masked_emb, segmax_t.T, k_eff)
    else:
        # f32 slabs: HIGHEST so rankings match the reference's f32 math.
        # bf16 slabs: default passes (inputs already carry bf16 precision).
        prec = (
            jax.lax.Precision.HIGHEST
            if corpus.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        emb = jnp.einsum(
            "qd,nd->qn",
            queries,
            corpus,
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        masked_emb = jnp.where(valid_mask[None, :], emb, NEG_INF)
        if n >= 65536:
            from rust_local_rag_tpu.ops.fast_topk import (
                segmented_exact_topk_scores,
            )

            e_vals, e_idx = segmented_exact_topk_scores.__wrapped__(
                masked_emb, k_eff
            )
        else:
            e_vals, e_idx = jax.lax.top_k(masked_emb, k_eff)
    return _blend_union(
        masked_emb, e_vals, e_idx, lex_slots, lex_vals,
        w_embedding, w_lexical, k, k_eff,
        rows_fn=lambda safe: jnp.take(
            corpus, safe.reshape(-1), axis=0
        ).reshape(qn, k, corpus.shape[1]),
        with_sims=with_sims,
    )


def _blend_union(
    masked_emb, e_vals, e_idx, lex_slots, lex_vals,
    w_embedding, w_lexical, k: int, k_eff: int,
    rows_fn, with_sims: bool,
):
    """Shared back half of the hybrid first stage: blend the exact
    embedding top-k with the sparse lexical hits over their union and
    select the combined top-k (ops-module docstring for the exactness
    argument). rows_fn(safe_idx [Q,k]) -> [Q,k,D] candidate embeddings,
    used only for the with_sims MMR fusion."""
    if k_eff < k:
        e_vals = jnp.pad(
            e_vals, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF
        )
        e_idx = jnp.pad(e_idx, ((0, 0), (0, k - k_eff)), constant_values=-1)
    e_idx = e_idx.astype(jnp.int32)

    # lexical normalization: per-query max over the hit list, floored at
    # f32::EPSILON (rag_engine.rs:515-519)
    lex_pad = lex_slots < 0
    lv = jnp.where(lex_pad, 0.0, lex_vals.astype(jnp.float32))
    max_lex = jnp.maximum(
        jnp.max(lv, axis=1, keepdims=True), jnp.float32(1.1920929e-07)
    )
    lex_norm_sparse = lv / max_lex  # [Q, L]

    # embedding-side candidates: add any lexical contribution they have
    # (an e_idx element that is also a lex slot needs its boost)
    match_e = e_idx[:, :, None] == jnp.where(lex_pad, -2, lex_slots)[:, None, :]
    e_lexn = jnp.sum(
        jnp.where(match_e, lex_norm_sparse[:, None, :], 0.0), axis=2
    )  # [Q, k]
    e_invalid = e_idx < 0
    e_comb = jnp.where(
        e_invalid, NEG_INF, w_embedding * e_vals + w_lexical * e_lexn
    )

    # lexical-side candidates: gather their embedding scores; drop pads,
    # invalid slots, and duplicates already present on the embedding side
    safe_slots = jnp.where(lex_pad, 0, lex_slots)
    l_emb = jnp.take_along_axis(masked_emb, safe_slots, axis=1)  # [Q, L]
    dup = jnp.any(
        lex_slots[:, :, None] == jnp.where(e_invalid, -2, e_idx)[:, None, :],
        axis=2,
    )
    l_dead = lex_pad | dup | ~jnp.isfinite(l_emb)
    l_comb = jnp.where(
        l_dead, NEG_INF, w_embedding * l_emb + w_lexical * lex_norm_sparse
    )

    # exact top-k over the union
    all_comb = jnp.concatenate([e_comb, l_comb], axis=1)        # [Q, k+L]
    all_emb = jnp.concatenate([e_vals, l_emb], axis=1)
    all_lexn = jnp.concatenate([e_lexn, lex_norm_sparse], axis=1)
    all_idx = jnp.concatenate([e_idx, lex_slots], axis=1)

    vals, sel = jax.lax.top_k(all_comb, k)
    idx = jnp.take_along_axis(all_idx, sel, axis=1)
    emb_k = jnp.take_along_axis(all_emb, sel, axis=1)
    lex_k = jnp.take_along_axis(all_lexn, sel, axis=1)

    invalid = vals == NEG_INF
    idx = jnp.where(invalid, -1, idx)
    if not with_sims:
        return vals, emb_k, lex_k, idx.astype(jnp.int32)

    # candidate pairwise similarities for MMR, fused into this dispatch
    safe = jnp.maximum(idx, 0)  # [Q, k]
    cand_emb = rows_fn(safe)
    cand_sims = jnp.einsum(
        "qkd,qjd->qkj",
        cand_emb,
        cand_emb,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return vals, emb_k, lex_k, idx.astype(jnp.int32), cand_sims


@functools.partial(jax.jit, static_argnames=("k", "with_sims"))
def hybrid_topk_dequant_full(
    queries: jax.Array,      # [Q, D] f32 unit-normalized
    values: jax.Array,       # [N, D] int8 corpus
    scales: jax.Array,       # [N, 1] f32 per-row scales
    valid_mask: jax.Array,   # [N] bool
    lex_slots: jax.Array,    # [Q, L] int32
    lex_vals: jax.Array,     # [Q, L] f32
    w_embedding: jax.Array,
    w_lexical: jax.Array,
    k: int,
    with_sims: bool = False,
):
    """UNCONDITIONALLY exact int8 lane: score the FULL slab in f32 against
    the dequantized corpus — <q, v_i8>_f32(HIGHEST) * scale_i, no query
    quantization, no candidate pool — then the standard exact selection +
    union blend. This is the escalation target when
    hybrid_topk_quantized's certificate fails (adversarial near-ties);
    the engine re-runs only the failing queries here, so the [Q, N] f32
    score matrix stays small (Q = failure bucket, not the serving batch).
    The int8 slab is read directly (XLA fuses the int8->f32 convert into
    the dot); the f32 corpus is never materialized in HBM.
    """
    qn = queries.shape[0]
    n = values.shape[0]
    q32 = queries.astype(jnp.float32)
    emb = jax.lax.dot_general(
        q32,
        values.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) * scales[:, 0][None, :]
    masked_emb = jnp.where(valid_mask[None, :], emb, NEG_INF)
    k_eff = min(k, n)
    if n >= 65536:
        from rust_local_rag_tpu.ops.fast_topk import (
            segmented_exact_topk_scores,
        )

        e_vals, e_idx = segmented_exact_topk_scores.__wrapped__(
            masked_emb, k_eff
        )
    else:
        e_vals, e_idx = jax.lax.top_k(masked_emb, k_eff)

    def rows_fn(safe):
        rows = jnp.take(values, safe.reshape(-1), axis=0).astype(jnp.float32)
        row_scales = jnp.take(scales, safe.reshape(-1), axis=0)
        return (rows * row_scales).reshape(qn, k, values.shape[1])

    return _blend_union(
        masked_emb, e_vals, e_idx, lex_slots, lex_vals,
        w_embedding, w_lexical, k, k_eff,
        rows_fn=rows_fn, with_sims=with_sims,
    )


@functools.partial(jax.jit, static_argnames=("k",))
def hybrid_topk_packed(
    queries: jax.Array,
    corpus: jax.Array,
    valid_mask: jax.Array,
    lex_slots: jax.Array,
    lex_vals: jax.Array,
    w_embedding: jax.Array,
    w_lexical: jax.Array,
    k: int,
):
    """hybrid_topk with the four outputs PACKED into one [Q, 4, k] INT32
    array (float planes bitcast to int32). Through a remote-attached TPU
    every device->host fetch pays a full RPC round trip (~40-50 ms measured
    on the axon tunnel); fetching four arrays separately quadruples that.
    Channels: 0=bits(combined), 1=bits(embedding), 2=bits(lexical_norm),
    3=int32 idx.

    The pack rides an INTEGER array on purpose: the int-in-float variant
    (bitcast idx into an f32 plane) is corrupted on the axon TPU backend —
    the fused program flushes denormal f32 lanes to zero (slot ids < ~8.4M
    are denormal bit patterns) and canonicalizes 0xFFFFFFFF (-1 sentinel)
    to qNaN 0x7FC00000, so every slot came back 0. Float bits stored in
    int32 lanes only pass through copies/concats, which are bit-exact.
    """
    vals, emb_k, lex_k, idx = hybrid_topk.__wrapped__(
        queries, corpus, valid_mask, lex_slots, lex_vals,
        w_embedding, w_lexical, k,
    )
    bits = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)  # noqa: E731
    return jnp.stack([bits(vals), bits(emb_k), bits(lex_k), idx], axis=1)


@functools.partial(jax.jit, static_argnames=("pool_k", "out_k"))
def hybrid_topk_packed_mmr(
    queries: jax.Array,
    corpus: jax.Array,
    valid_mask: jax.Array,
    lex_slots: jax.Array,
    lex_vals: jax.Array,
    w_embedding: jax.Array,
    w_lexical: jax.Array,
    diversity: jax.Array,
    emb_floor: jax.Array,
    pool_k: int,
    out_k: int,
):
    """Diversity (MMR) search as ONE device program with ONE packed fetch.

    Chains, entirely on device: first-stage hybrid pool selection
    (pool_k candidates) -> confidence-floor gate -> pool compaction ->
    candidate-embedding gather -> vmapped greedy MMR
    (ops/mmr.mmr_select) -> plane reordering into the hot lane's packed
    [Q, 4, out_k] int32 layout (see hybrid_topk_packed for the carrier
    rationale). The object lane (engine.search_with_diversity_batch)
    makes three device trips for the same work (pool search, embedding
    gather, MMR select) — each ~40-50 ms through a remote-attached TPU
    tunnel — plus per-result host object churn in between; this is the
    MMR analogue of the rerank-off hot lane.

    Semantics match the object lane exactly (reference behavior
    rag_engine.rs:717-759): the confidence floor is applied to the POOL
    before MMR (search_batch gates its outputs, then MMR selects from
    survivors), the first pick is the top-ranked survivor, and returned
    scores are the original blend scores in MMR order. Gating before
    selection requires compacting survivors to the front (mmr_select's
    valid_count is a prefix length) — a stable [Q, P] argsort on a
    gated-to-the-end key, cheap next to the corpus scan.

    emb_floor <= 0 disables the gate (a cosine can be legitimately
    negative, so 0.0 must not drop candidates).
    """
    from rust_local_rag_tpu.ops.mmr import mmr_select

    vals, emb_k, lex_k, idx = hybrid_topk.__wrapped__(
        queries, corpus, valid_mask, lex_slots, lex_vals,
        w_embedding, w_lexical, pool_k,
    )
    p = vals.shape[1]
    keep = (idx >= 0) & jnp.isfinite(vals)
    keep = keep & jnp.where(emb_floor > 0.0, emb_k >= emb_floor, True)

    # Stable compaction: survivors keep their relative (descending-score)
    # order at the front; gated candidates sink to the tail.
    rank = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    order = jnp.argsort(jnp.where(keep, rank, rank + p), axis=1)
    perm = lambda a: jnp.take_along_axis(a, order, axis=1)  # noqa: E731
    vals_c, emb_c, lex_c, idx_c = perm(vals), perm(emb_k), perm(lex_k), perm(idx)
    counts = jnp.sum(keep.astype(jnp.int32), axis=1)
    tail = rank >= counts[:, None]
    vals_c = jnp.where(tail, NEG_INF, vals_c)
    idx_c = jnp.where(tail, -1, idx_c)

    cand = jnp.take(corpus, jnp.where(idx_c >= 0, idx_c, 0), axis=0)
    lam = jnp.float32(diversity)
    sel = jax.vmap(
        lambda e, r, v: mmr_select.__wrapped__(e, r, out_k, lam, valid_count=v)
    )(cand, vals_c, counts)  # [Q, out_k], -1 for unused slots

    ok = sel >= 0
    safe = jnp.where(ok, sel, 0)
    take = lambda a: jnp.take_along_axis(a, safe, axis=1)  # noqa: E731
    vals_o = jnp.where(ok, take(vals_c), NEG_INF)
    emb_o = jnp.where(ok, take(emb_c), NEG_INF)
    lex_o = jnp.where(ok, take(lex_c), 0.0)
    idx_o = jnp.where(ok, take(idx_c), -1)
    bits = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)  # noqa: E731
    return jnp.stack([bits(vals_o), bits(emb_o), bits(lex_o), idx_o], axis=1)


@functools.partial(jax.jit, static_argnames=("k", "candidates"))
def hybrid_topk_quantized_packed(
    queries: jax.Array,
    values: jax.Array,
    scales: jax.Array,
    l1: jax.Array,
    valid_mask: jax.Array,
    lex_slots: jax.Array,
    lex_vals: jax.Array,
    w_embedding: jax.Array,
    w_lexical: jax.Array,
    k: int,
    candidates: int = 0,
):
    """Packed single-fetch variant of hybrid_topk_quantized (see
    hybrid_topk_packed for the channel layout and the int32-carrier
    rationale). Channel 4 broadcasts the per-query exactness certificate
    (1 = certified) as plain int32."""
    vals, emb_k, lex_k, idx, exact = hybrid_topk_quantized.__wrapped__(
        queries, values, scales, l1, valid_mask, lex_slots, lex_vals,
        w_embedding, w_lexical, k, candidates=candidates,
    )
    flag = jnp.broadcast_to(exact.astype(jnp.int32)[:, None], vals.shape)
    bits = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)  # noqa: E731
    return jnp.stack(
        [bits(vals), bits(emb_k), bits(lex_k), idx, flag], axis=1
    )


def unpack_topk(arr, nq: int, k: int):
    """Host-side unpack of a fetched [Q, 4|5, k'] packed int32 result into
    (vals, emb, lex, idx) numpy views trimmed to [nq, k] — the float planes
    are reinterpreted from their int32 bit carriers (see
    hybrid_topk_packed)."""
    import numpy as np

    arr = np.ascontiguousarray(np.asarray(arr))
    assert arr.dtype == np.int32, arr.dtype
    f = arr.view(np.float32)
    vals = f[:nq, 0, :k]
    emb = f[:nq, 1, :k]
    lex = f[:nq, 2, :k]
    idx = arr[:nq, 3, :k]
    return vals, emb, lex, idx


def pack_sparse_lex(pairs, slot_for_id, width: int = LEX_WIDTH):
    """Host helper: [(chunk_id, score)] -> ([1, width] slots, [1, width]
    vals) int32/f32 numpy arrays, -1-padded."""
    import numpy as np

    slots = np.full((1, width), -1, dtype=np.int32)
    vals = np.zeros((1, width), dtype=np.float32)
    j = 0
    for cid, score in pairs:
        slot = slot_for_id(cid)
        if slot is None or j >= width:
            continue
        slots[0, j] = slot
        vals[0, j] = score
        j += 1
    return slots, vals


@functools.partial(
    jax.jit, static_argnames=("k", "with_sims", "candidates")
)
def hybrid_topk_quantized(
    queries: jax.Array,      # [Q, D] f32 unit-normalized
    values: jax.Array,       # [N, D] int8 corpus
    scales: jax.Array,       # [N, 1] f32 per-row scales
    l1: jax.Array,           # [N] f32 scale_i * ||v_i8||_1 (cert bound)
    valid_mask: jax.Array,   # [N] bool
    lex_slots: jax.Array,    # [Q, L] int32
    lex_vals: jax.Array,     # [Q, L] f32
    w_embedding: jax.Array,
    w_lexical: jax.Array,
    k: int,
    with_sims: bool = False,
    candidates: int = 0,     # phase-1 pool size (0 -> bucket of 4k)
):
    """Int8 capacity-mode variant of hybrid_topk (the full 10M x 768 target
    corpus fits one v5e chip at int8) — EXACT w.r.t. the dequantized int8
    corpus, certified per query.

    Two-phase with a soundness certificate (VERDICT r2 missing #6 — the
    old phase-1 selection could drop a true f32 top-k candidate at the
    int8 precision boundary):

      phase 1 computes p1(i) = <q_i8, v_i8> * q_scale * scale_i on the
      int8 MXU. The only approximation vs. the true dequantized score
      s(i) = <q_f32, v_i8 * scale_i> is the query quantization error
      e = q_f32 - q_i8 * q_scale with |e_j| <= q_scale / 2, so

          |s(i) - p1(i)| <= (q_scale/2) * scale_i * ||v_i8||_1  =: eps_i

      (Hoelder; the integer dot itself is exact in int32). Selecting the
      top-C pool by the UPPER bound u(i) = p1(i) + eps_i and rescoring it
      in f32 (HIGHEST) yields a certificate: every unselected row has
      u <= tau := min selected u, hence true score <= tau; if the f32
      k-th selected score >= tau, the top-k is provably exact. The [Q]
      `exact` output reports the certificate; the engine escalates C for
      the (adversarial near-tie) queries where it fails, terminating at
      C >= N where selection is trivially exhaustive. eps is inflated by
      1e-3 relative + 1e-6 absolute to absorb f32 rounding of the
      p1 products.

    Returns (combined, embedding, lexical_norm, idx, exact[, cand_sims]).
    """
    qn = queries.shape[0]
    n = values.shape[0]
    d = values.shape[1]

    if candidates <= 0:
        candidates = min(_next_pow2(4 * k), n)
    c = min(max(candidates, k), n)

    # phase 1: int8 x int8 scoring for selection
    q32 = queries.astype(jnp.float32)
    q_absmax = jnp.max(jnp.abs(q32), axis=1, keepdims=True)
    q_scale = jnp.maximum(q_absmax, 1e-10) / 127.0
    q_int8 = jnp.clip(jnp.round(q32 / q_scale), -127, 127).astype(jnp.int8)
    scores_i32 = jax.lax.dot_general(
        q_int8,
        values,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    emb = scores_i32.astype(jnp.float32) * q_scale * scales[:, 0][None, :]
    # upper bound on the true dequantized score of every row
    eps = (q_scale * 0.5) * l1[None, :] * 1.001 + 1e-6
    upper = jnp.where(valid_mask[None, :], emb + eps, NEG_INF)

    c_eff = min(c, n)
    if n >= 65536:
        from rust_local_rag_tpu.ops.fast_topk import (
            segmented_exact_topk_scores,
        )

        u_vals, e_idx = segmented_exact_topk_scores.__wrapped__(
            upper, c_eff
        )
    else:
        u_vals, e_idx = jax.lax.top_k(upper, c_eff)
    e_idx = e_idx.astype(jnp.int32)
    # slots whose upper bound is -inf are masked/padding — the f32
    # rescore must never resurrect them
    e_idx = jnp.where(u_vals == NEG_INF, -1, e_idx)
    # tau: best possible true score among UNSELECTED rows. When the pool
    # covers every valid row (c_eff >= n_valid) nothing is unselected.
    n_valid = jnp.sum(valid_mask.astype(jnp.int32))
    tau = jnp.where(
        c_eff >= n_valid, NEG_INF, u_vals[:, -1]
    )  # [Q]

    # union with the lexical hit slots (same containment argument)
    lex_pad = lex_slots < 0
    all_idx = jnp.concatenate([e_idx, jnp.where(lex_pad, -1, lex_slots)], axis=1)
    # dedup: kill later duplicates by first-occurrence mask
    eq = all_idx[:, :, None] == all_idx[:, None, :]
    first = jnp.argmax(eq, axis=2)  # first position holding this slot
    pos = jax.lax.broadcasted_iota(jnp.int32, all_idx.shape, 1)
    keep = (first == pos) & (all_idx >= 0)

    # phase 2: dequantize the union rows, rescore everything in f32
    # (HIGHEST keeps the MXU from rounding the rescore to bf16 — the
    # exactness claim is w.r.t. true f32 dequantized scores)
    safe = jnp.maximum(all_idx, 0)
    rows = jnp.take(values, safe.reshape(-1), axis=0).astype(jnp.float32)
    row_scales = jnp.take(scales, safe.reshape(-1), axis=0)
    rows = (rows * row_scales).reshape(qn, -1, d)
    emb_f32 = jnp.einsum(
        "qd,qcd->qc",
        q32,
        rows,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    # exactness certificate: the k best f32-rescored DENSE scores in the
    # pool must beat the best possible true score of any unselected row
    pool_scores = jnp.where(e_idx >= 0, emb_f32[:, :c_eff], NEG_INF)
    kth = jax.lax.top_k(pool_scores, min(k, c_eff))[0][:, -1]
    exact = kth >= tau  # [Q] bool (-inf >= -inf when pool == corpus)

    # lexical normalization + alignment to the union axis
    lv = jnp.where(lex_pad, 0.0, lex_vals.astype(jnp.float32))
    max_lex = jnp.maximum(
        jnp.max(lv, axis=1, keepdims=True), jnp.float32(1.1920929e-07)
    )
    lexn_sparse = lv / max_lex
    lexn = jnp.concatenate(
        [jnp.zeros((qn, c_eff), dtype=jnp.float32), lexn_sparse], axis=1
    )
    # e-side lexical contributions (same matching as hybrid_topk)
    match_e = e_idx[:, :, None] == jnp.where(lex_pad, -2, lex_slots)[:, None, :]
    e_lexn = jnp.sum(jnp.where(match_e, lexn_sparse[:, None, :], 0.0), axis=2)
    lexn = lexn.at[:, : e_idx.shape[1]].set(e_lexn)

    combined = jnp.where(
        keep, w_embedding * emb_f32 + w_lexical * lexn, NEG_INF
    )
    if combined.shape[1] < k:
        padw = k - combined.shape[1]
        combined = jnp.pad(
            combined, ((0, 0), (0, padw)), constant_values=NEG_INF
        )
        all_idx = jnp.pad(
            all_idx, ((0, 0), (0, padw)), constant_values=-1
        )
        emb_f32 = jnp.pad(
            emb_f32, ((0, 0), (0, padw)), constant_values=NEG_INF
        )
        lexn = jnp.pad(lexn, ((0, 0), (0, padw)))
        rows = jnp.pad(rows, ((0, 0), (0, padw), (0, 0)))
    vals, sel = jax.lax.top_k(combined, k)
    idx = jnp.take_along_axis(all_idx, sel, axis=1)
    emb_k = jnp.take_along_axis(emb_f32, sel, axis=1)
    lex_k = jnp.take_along_axis(lexn, sel, axis=1)
    invalid = vals == NEG_INF
    idx = jnp.where(invalid, -1, idx)
    if not with_sims:
        return vals, emb_k, lex_k, idx.astype(jnp.int32), exact

    cand_rows = jnp.take_along_axis(rows, sel[:, :, None], axis=1)
    cand_sims = jnp.einsum(
        "qkd,qjd->qkj", cand_rows, cand_rows, preferred_element_type=jnp.float32
    )
    return vals, emb_k, lex_k, idx.astype(jnp.int32), exact, cand_sims
