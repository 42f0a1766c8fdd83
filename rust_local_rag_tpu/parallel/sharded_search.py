"""Corpus-sharded exact top-k over an ICI mesh.

The design from SURVEY.md §5.8 / BASELINE.md: the chunk matrix is row-sharded
across devices; each device computes an exact local top-k over its rows with
the single-chip kernel (ops/topk.streaming_topk), then the per-shard
(score, global-index) pairs are all-gathered and reduced with one final
top-k. Exactness holds because every shard contributes its full local top-k
and k <= rows-per-shard is asserted; ties break deterministically by global
index (lower shard wins, matching single-device lax.top_k semantics).

The queries are replicated along the corpus axis; a second "data" mesh axis
(DP over query batches) composes with this for QPS scaling — queries shard
along "data" while the merge below runs per data-replica.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from rust_local_rag_tpu.ops.topk import streaming_topk


def sharded_topk(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    mesh: Mesh,
    corpus_axis: str = "corpus",
    tile_n: int = 65536,
    valid_count: Optional[jax.Array] = None,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
):
    """Exact top-k with the corpus row-sharded over `corpus_axis`.

    Args:
        queries: [Q, D], replicated.
        corpus:  [N, D] global corpus; N must divide evenly by the axis size
                 (pad with masked rows otherwise — see valid_count).
        k:       results per query; must satisfy k <= N / num_shards for the
                 per-shard merge to be exact.
        valid_count: optional global row count — rows >= valid_count (the
                 padded tail of the LAST shard) are masked out.

    Returns:
        (values [Q, k] f32, global indices [Q, k] int32), replicated.
    """
    n_shards = mesh.shape[corpus_axis]
    n = corpus.shape[0]
    if n % n_shards != 0:
        raise ValueError(
            f"corpus rows {n} must divide evenly across {n_shards} shards; "
            "pad the slab to a multiple of the shard count"
        )
    rows_per_shard = n // n_shards
    if k > rows_per_shard:
        # exactness requires each shard to return >= k candidates
        raise ValueError(
            f"k={k} exceeds rows per shard {rows_per_shard}; exact merge "
            "needs k <= shard size (SURVEY.md §7 'Exactness under sharding')"
        )

    vc = jnp.int32(n if valid_count is None else valid_count)

    def local(q, c_shard, vc_arr):
        shard_id = jax.lax.axis_index(corpus_axis)
        base = shard_id * rows_per_shard
        # local valid rows: clamp(global_valid - base, 0, rows_per_shard)
        local_valid = jnp.clip(vc_arr[0] - base, 0, rows_per_shard)
        if rows_per_shard >= 65536:
            # big shard: fused scores + segmented exact selection beats the
            # per-tile-sort streaming path ~4x (see ops/fast_topk.py)
            from rust_local_rag_tpu.ops.fast_topk import (
                segmented_exact_topk_scores,
            )

            scores = jnp.einsum(
                "qd,nd->qn",
                q,
                c_shard,
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            col = jax.lax.broadcasted_iota(
                jnp.int32, (q.shape[0], rows_per_shard), 1
            )
            scores = jnp.where(col < local_valid, scores, -jnp.inf)
            vals, idx = segmented_exact_topk_scores.__wrapped__(scores, k)
        else:
            vals, idx = streaming_topk(
                q, c_shard, k, tile_n=tile_n, valid_count=local_valid,
                precision=precision,
            )
        idx = jnp.where(idx >= rows_per_shard, rows_per_shard, idx)
        gidx = base + idx
        # gather every shard's candidates: [n_shards, Q, k]
        all_vals = jax.lax.all_gather(vals, corpus_axis)
        all_idx = jax.lax.all_gather(gidx, corpus_axis)
        q_n = q.shape[0]
        flat_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(q_n, n_shards * k)
        flat_idx = jnp.transpose(all_idx, (1, 0, 2)).reshape(q_n, n_shards * k)
        mv, sel = jax.lax.top_k(flat_vals, k)
        mi = jnp.take_along_axis(flat_idx, sel, axis=1)
        return mv, mi

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(corpus_axis, None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(queries, corpus, jnp.asarray([vc], dtype=jnp.int32))


@functools.partial(
    jax.jit,
    static_argnames=("k", "mesh", "corpus_axis", "with_sims", "data_axis"),
)
def sharded_hybrid_topk(
    queries: jax.Array,      # [Q, D] unit-normalized, replicated
    corpus: jax.Array,       # [N, D] slab, row-sharded over corpus_axis
    valid_mask: jax.Array,   # [N] bool, sharded like the slab
    lex_slots: jax.Array,    # [Q, L] int32 GLOBAL slot ids (-1 pad), replicated
    lex_vals: jax.Array,     # [Q, L] f32 raw BM25 scores, replicated
    w_embedding: jax.Array,
    w_lexical: jax.Array,
    k: int,
    mesh: Mesh,
    corpus_axis: str = "corpus",
    with_sims: bool = False,
    data_axis: str | None = None,
):
    """Corpus-sharded variant of ops/hybrid.hybrid_topk — same contract,
    exact same results (up to cross-shard tie order).

    Each shard runs the scatter-free union blend on its rows: local exact
    top-k over blended scores plus its local lexical hit slots; the
    per-shard candidates ride ONE all_gather over ICI and a final top-k
    merges them. Exactness: a global blended top-k element placed on shard
    s has < k better elements globally, hence < k within s, so it is inside
    s's local blended top-k (or is one of s's lexical slots, which are all
    carried). The lexical normalization (per-query max over the FULL hit
    list, f32::EPSILON floor — rag_engine.rs:515-519) is computed from the
    replicated hit list, so every shard uses the identical denominator.
    """
    qn = queries.shape[0]
    n = corpus.shape[0]
    # corpus_axis may be a TUPLE of mesh axes for hierarchical sharding:
    # e.g. ("slice", "corpus") row-shards over slices x intra-slice chips
    # and the merge below runs innermost-first, so only k candidates per
    # slice cross the slice axis (DCN in a real multi-slice deployment —
    # see parallel/multislice.py for the traffic argument).
    axes = corpus_axis if isinstance(corpus_axis, tuple) else (corpus_axis,)
    n_shards = 1
    for a in axes:
        n_shards *= mesh.shape[a]
    if n % n_shards != 0:
        raise ValueError(
            f"slab rows {n} must divide across {n_shards} shards"
        )
    rows = n // n_shards
    k_local = min(k, rows)

    def local(q, c_shard, m_shard, slots, lvals):
        # flat shard index with axes laid out outer-major
        shard_id = jax.lax.axis_index(axes[-1])
        stride = mesh.shape[axes[-1]]
        for a in reversed(axes[:-1]):
            shard_id = shard_id + jax.lax.axis_index(a) * stride
            stride = stride * mesh.shape[a]
        base = shard_id * rows

        prec = (
            jax.lax.Precision.HIGHEST
            if c_shard.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        emb = jnp.einsum(
            "qd,nd->qn", q, c_shard,
            preferred_element_type=jnp.float32, precision=prec,
        )
        masked_emb = jnp.where(m_shard[None, :], emb, NEG_INF)
        if rows >= 65536:
            from rust_local_rag_tpu.ops.fast_topk import (
                segmented_exact_topk_scores,
            )

            e_vals, e_idx = segmented_exact_topk_scores.__wrapped__(
                masked_emb, k_local
            )
        else:
            e_vals, e_idx = jax.lax.top_k(masked_emb, k_local)
        e_idx = e_idx.astype(jnp.int32)

        # global lexical normalization from the replicated hit list
        lex_pad = slots < 0
        lv = jnp.where(lex_pad, 0.0, lvals.astype(jnp.float32))
        max_lex = jnp.maximum(
            jnp.max(lv, axis=1, keepdims=True), jnp.float32(1.1920929e-07)
        )
        lexn_sparse = lv / max_lex  # [Q, L]

        # localize: hits on THIS shard get a local slot; others are dead
        local_slot = slots - base
        on_shard = (~lex_pad) & (local_slot >= 0) & (local_slot < rows)

        # e-side candidates: add any local lexical contribution
        match_e = e_idx[:, :, None] == jnp.where(
            on_shard, local_slot, -2
        )[:, None, :]
        e_lexn = jnp.sum(
            jnp.where(match_e, lexn_sparse[:, None, :], 0.0), axis=2
        )
        e_dead = e_vals == NEG_INF
        e_comb = jnp.where(
            e_dead, NEG_INF, w_embedding * e_vals + w_lexical * e_lexn
        )

        # l-side candidates: this shard's lexical hits only
        safe_local = jnp.where(on_shard, local_slot, 0)
        l_emb = jnp.take_along_axis(masked_emb, safe_local, axis=1)
        dup = jnp.any(
            jnp.where(on_shard, local_slot, -2)[:, :, None]
            == jnp.where(e_dead, -3, e_idx)[:, None, :],
            axis=2,
        )
        l_dead = ~on_shard | dup | ~jnp.isfinite(l_emb)
        l_comb = jnp.where(
            l_dead, NEG_INF, w_embedding * l_emb + w_lexical * lexn_sparse
        )

        comb = jnp.concatenate([e_comb, l_comb], axis=1)   # [Q, k_local+L]
        embs = jnp.concatenate([e_vals, l_emb], axis=1)
        lexn = jnp.concatenate([e_lexn, lexn_sparse], axis=1)
        gidx = jnp.concatenate(
            [
                jnp.where(e_dead, -1, e_idx + base),
                jnp.where(on_shard, slots, -1),
            ],
            axis=1,
        )
        # per-shard top-k over the union keeps the all_gather payload small
        s_vals, sel = jax.lax.top_k(comb, k_local)
        s_emb = jnp.take_along_axis(embs, sel, axis=1)
        s_lexn = jnp.take_along_axis(lexn, sel, axis=1)
        s_idx = jnp.take_along_axis(gidx, sel, axis=1)

        # hierarchical merge, innermost axis first: each level gathers the
        # current candidate sets along ONE mesh axis and reduces back to
        # (at most) k — with axes=("slice","corpus") only k pairs per
        # slice ever cross the outer (DCN) axis.
        # q.shape[0] is the LOCAL query-block size — under a composed
        # ("data" x corpus) mesh it is Q/dp, NOT the jit-level qn
        q_n = q.shape[0]
        vals, emb_k, lex_k, idx = s_vals, s_emb, s_lexn, s_idx
        for a in reversed(axes):
            av = jax.lax.all_gather(vals, a)    # [sz, Q, w]
            ae = jax.lax.all_gather(emb_k, a)
            al = jax.lax.all_gather(lex_k, a)
            ai = jax.lax.all_gather(idx, a)
            fv = jnp.transpose(av, (1, 0, 2)).reshape(q_n, -1)
            fe = jnp.transpose(ae, (1, 0, 2)).reshape(q_n, -1)
            fl = jnp.transpose(al, (1, 0, 2)).reshape(q_n, -1)
            fi = jnp.transpose(ai, (1, 0, 2)).reshape(q_n, -1)
            kk = min(k, fv.shape[1])
            vals, sel2 = jax.lax.top_k(fv, kk)
            emb_k = jnp.take_along_axis(fe, sel2, axis=1)
            lex_k = jnp.take_along_axis(fl, sel2, axis=1)
            idx = jnp.take_along_axis(fi, sel2, axis=1)
        if kk < k:
            pad = k - kk
            vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=NEG_INF)
            emb_k = jnp.pad(emb_k, ((0, 0), (0, pad)))
            lex_k = jnp.pad(lex_k, ((0, 0), (0, pad)))
            idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
        idx = jnp.where(vals == NEG_INF, -1, idx)
        return vals, emb_k, lex_k, idx.astype(jnp.int32)

    # Composed serving mesh: with a second "data" axis, the query batch
    # (and its per-query lexical hit lists and outputs) shard along it —
    # DP query replicas x corpus shards in ONE device program. The local
    # body is unchanged: each device handles its query block over its
    # corpus rows; the merge all_gather names only the corpus axis.
    qspec = P(data_axis, None) if data_axis else P()
    cspec = axes if len(axes) > 1 else axes[0]
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(qspec, P(cspec, None), P(cspec), qspec, qspec),
        out_specs=(qspec, qspec, qspec, qspec),
        check_vma=False,
    )
    vals, emb_k, lex_k, idx = fn(
        queries, corpus, valid_mask, lex_slots, lex_vals
    )
    if not with_sims:
        return vals, emb_k, lex_k, idx
    # candidate pairwise sims for MMR: gathered OUTSIDE the shard_map so
    # GSPMD inserts the cross-shard gather collectives automatically
    safe = jnp.maximum(idx, 0)
    cand = jnp.take(corpus, safe.reshape(-1), axis=0).reshape(
        qn, k, corpus.shape[1]
    )
    sims = jnp.einsum(
        "qkd,qjd->qkj", cand, cand,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return vals, emb_k, lex_k, idx, sims


NEG_INF = float("-inf")  # python float: trace-safe module constant (see ops/topk.py)


@functools.partial(
    jax.jit,
    static_argnames=("k", "mesh", "corpus_axis", "with_sims", "data_axis"),
)
def sharded_hybrid_topk_quantized(
    queries: jax.Array,      # [Q, D] f32 unit-normalized, replicated
    values: jax.Array,       # [N, D] int8 slab, row-sharded
    scales: jax.Array,       # [N, 1] f32 row scales, sharded like the slab
    l1: jax.Array,           # [N] f32 scale_i * ||v_i8||_1, sharded
    valid_mask: jax.Array,   # [N] bool, sharded
    lex_slots: jax.Array,    # [Q, L] int32 global slots, replicated
    lex_vals: jax.Array,     # [Q, L] f32, replicated
    w_embedding: jax.Array,
    w_lexical: jax.Array,
    k: int,
    mesh: Mesh,
    corpus_axis: str = "corpus",
    with_sims: bool = False,
    data_axis: str | None = None,
):
    """Sharded int8 capacity mode: the 10M-chunks-per-chip slab scales to
    N chips (80M chunks on a v5e-8). Per shard this mirrors
    ops/hybrid.hybrid_topk_quantized — int8 MXU phase-1 selection by the
    certified UPPER bound (p1 + query-quantization error, see the ops
    docstring for the proof), f32 rescore of the local candidate union —
    then one all_gather merges the per-shard rescored candidates. The
    merged top-k is exact iff every shard's local dense top-k is exact;
    the returned [Q] flag ANDs the per-shard certificates (min over the
    corpus axes), and the engine escalates failures to
    sharded_hybrid_topk_dequant_full."""
    qn = queries.shape[0]
    n = values.shape[0]
    d = values.shape[1]
    axes = corpus_axis if isinstance(corpus_axis, tuple) else (corpus_axis,)
    n_shards = 1
    for a in axes:
        n_shards *= mesh.shape[a]
    if n % n_shards != 0:
        raise ValueError(f"slab rows {n} must divide across {n_shards}")
    rows = n // n_shards
    k_local = min(k, rows)

    def local(q, v_shard, s_shard, l1_shard, m_shard, slots, lvals):
        shard_id = jax.lax.axis_index(axes[-1])
        stride = mesh.shape[axes[-1]]
        for a in reversed(axes[:-1]):
            shard_id = shard_id + jax.lax.axis_index(a) * stride
            stride = stride * mesh.shape[a]
        base = shard_id * rows

        # phase 1: int8 x int8 selection (ops/hybrid.py semantics) by the
        # certified upper bound
        q32 = q.astype(jnp.float32)
        q_absmax = jnp.max(jnp.abs(q32), axis=1, keepdims=True)
        q_scale = jnp.maximum(q_absmax, 1e-10) / 127.0
        q_int8 = jnp.clip(jnp.round(q32 / q_scale), -127, 127).astype(
            jnp.int8
        )
        scores_i32 = jax.lax.dot_general(
            q_int8, v_shard,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        emb = scores_i32.astype(jnp.float32) * q_scale * s_shard[:, 0][None, :]
        eps = (q_scale * 0.5) * l1_shard[None, :] * 1.001 + 1e-6
        upper = jnp.where(m_shard[None, :], emb + eps, NEG_INF)
        if rows >= 65536:
            from rust_local_rag_tpu.ops.fast_topk import (
                segmented_exact_topk_scores,
            )

            u_vals, e_idx = segmented_exact_topk_scores.__wrapped__(
                upper, k_local
            )
        else:
            u_vals, e_idx = jax.lax.top_k(upper, k_local)
        e_vals = u_vals  # width/carrier only; rescored in f32 below
        e_idx = jnp.where(u_vals == NEG_INF, -1, e_idx.astype(jnp.int32))
        n_valid_local = jnp.sum(m_shard.astype(jnp.int32))
        tau = jnp.where(k_local >= n_valid_local, NEG_INF, u_vals[:, -1])

        # union with this shard's lexical hits (global normalization)
        lex_pad = slots < 0
        lv = jnp.where(lex_pad, 0.0, lvals.astype(jnp.float32))
        max_lex = jnp.maximum(
            jnp.max(lv, axis=1, keepdims=True), jnp.float32(1.1920929e-07)
        )
        lexn_sparse = lv / max_lex
        local_slot = slots - base
        on_shard = (~lex_pad) & (local_slot >= 0) & (local_slot < rows)

        all_local = jnp.concatenate(
            [e_idx, jnp.where(on_shard, local_slot, -1)], axis=1
        )  # [Q, k_local+L] local indices
        eq = all_local[:, :, None] == all_local[:, None, :]
        first = jnp.argmax(eq, axis=2)
        pos = jax.lax.broadcasted_iota(jnp.int32, all_local.shape, 1)
        keep = (first == pos) & (all_local >= 0)

        # phase 2: dequantize + f32 rescore of the LOCAL union rows
        safe = jnp.maximum(all_local, 0)
        rows_f = jnp.take(v_shard, safe.reshape(-1), axis=0).astype(
            jnp.float32
        )
        row_scales = jnp.take(s_shard, safe.reshape(-1), axis=0)
        # local query-block size, NOT the jit-level qn (under a composed
        # ("data" x corpus) mesh the block is qn/dp — same latent bug as
        # the one fixed in the non-quantized merge reshape)
        rows_f = (rows_f * row_scales).reshape(q.shape[0], -1, d)
        emb_f32 = jnp.einsum(
            "qd,qcd->qc", q32, rows_f,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        # local exactness certificate (same argument as the unsharded op)
        pool_scores = jnp.where(
            e_idx >= 0, emb_f32[:, :k_local], NEG_INF
        )
        kth = jax.lax.top_k(pool_scores, k_local)[0][:, -1]
        local_exact = kth >= tau  # [Q_block] bool

        lexn = jnp.concatenate(
            [jnp.zeros_like(e_vals), jnp.where(on_shard, lexn_sparse, 0.0)],
            axis=1,
        )
        match_e = e_idx[:, :, None] == jnp.where(
            on_shard, local_slot, -2
        )[:, None, :]
        e_lexn = jnp.sum(
            jnp.where(match_e, lexn_sparse[:, None, :], 0.0), axis=2
        )
        lexn = lexn.at[:, : e_idx.shape[1]].set(e_lexn)

        comb = jnp.where(
            keep, w_embedding * emb_f32 + w_lexical * lexn, NEG_INF
        )
        s_vals, sel = jax.lax.top_k(comb, k_local)
        s_emb = jnp.take_along_axis(emb_f32, sel, axis=1)
        s_lexn = jnp.take_along_axis(lexn, sel, axis=1)
        g_all = jnp.where(all_local >= 0, all_local + base, -1)
        s_idx = jnp.take_along_axis(g_all, sel, axis=1)
        s_idx = jnp.where(s_vals == NEG_INF, -1, s_idx)

        # hierarchical merge, innermost axis first (see sharded_hybrid_topk)
        # q.shape[0] is the LOCAL query-block size — under a composed
        # ("data" x corpus) mesh it is Q/dp, NOT the jit-level qn
        q_n = q.shape[0]
        vals, emb_k, lex_k, idx = s_vals, s_emb, s_lexn, s_idx
        for a in reversed(axes):
            av = jax.lax.all_gather(vals, a)
            ae = jax.lax.all_gather(emb_k, a)
            al = jax.lax.all_gather(lex_k, a)
            ai = jax.lax.all_gather(idx, a)
            fv = jnp.transpose(av, (1, 0, 2)).reshape(q_n, -1)
            fe = jnp.transpose(ae, (1, 0, 2)).reshape(q_n, -1)
            fl = jnp.transpose(al, (1, 0, 2)).reshape(q_n, -1)
            fi = jnp.transpose(ai, (1, 0, 2)).reshape(q_n, -1)
            kk = min(k, fv.shape[1])
            vals, sel2 = jax.lax.top_k(fv, kk)
            emb_k = jnp.take_along_axis(fe, sel2, axis=1)
            lex_k = jnp.take_along_axis(fl, sel2, axis=1)
            idx = jnp.take_along_axis(fi, sel2, axis=1)
        if kk < k:
            pad = k - kk
            vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=NEG_INF)
            emb_k = jnp.pad(emb_k, ((0, 0), (0, pad)))
            lex_k = jnp.pad(lex_k, ((0, 0), (0, pad)))
            idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
        idx = jnp.where(vals == NEG_INF, -1, idx)
        # the merged top-k is exact iff EVERY shard certified its local
        # dense top-k: AND across the corpus axes
        failures = jax.lax.psum(
            1 - local_exact.astype(jnp.int32), tuple(axes)
        )
        exact = failures == 0
        return vals, emb_k, lex_k, idx.astype(jnp.int32), exact

    # composed ("data" x corpus) mesh: query-batch axis shards along data
    qspec = P(data_axis, None) if data_axis else P()
    qspec1 = P(data_axis) if data_axis else P()
    cspec = axes if len(axes) > 1 else axes[0]
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            qspec, P(cspec, None), P(cspec, None), P(cspec),
            P(cspec), qspec, qspec,
        ),
        out_specs=(qspec, qspec, qspec, qspec, qspec1),
        check_vma=False,
    )
    vals, emb_k, lex_k, idx, exact = fn(
        queries, values, scales, l1, valid_mask, lex_slots, lex_vals
    )
    if not with_sims:
        return vals, emb_k, lex_k, idx, exact
    safe = jnp.maximum(idx, 0)
    cand = jnp.take(values, safe.reshape(-1), axis=0).astype(jnp.float32)
    cand_scales = jnp.take(scales, safe.reshape(-1), axis=0)
    cand = (cand * cand_scales).reshape(qn, k, d)
    sims = jnp.einsum(
        "qkd,qjd->qkj", cand, cand, preferred_element_type=jnp.float32
    )
    return vals, emb_k, lex_k, idx, exact, sims


def sharded_hybrid_topk_dequant_full(
    queries: jax.Array,      # [Q, D] f32, replicated
    values: jax.Array,       # [N, D] int8 slab, row-sharded
    scales: jax.Array,       # [N, 1] f32, sharded
    valid_mask: jax.Array,   # [N] bool, sharded
    lex_slots: jax.Array,
    lex_vals: jax.Array,
    w_embedding: jax.Array,
    w_lexical: jax.Array,
    k: int,
    mesh: Mesh,
    corpus_axis: str = "corpus",
    data_axis: str | None = None,
):
    """UNCONDITIONALLY exact sharded int8 lane (the escalation target when
    sharded_hybrid_topk_quantized's certificate fails): each shard scores
    its slab in f32 against the dequantized rows (<q, v_i8>_f32(HIGHEST)
    * scale — no query quantization, no pool), takes its exact local
    top-k, and the standard hierarchical merge combines shards."""
    n = values.shape[0]
    d = values.shape[1]
    axes = corpus_axis if isinstance(corpus_axis, tuple) else (corpus_axis,)
    n_shards = 1
    for a in axes:
        n_shards *= mesh.shape[a]
    if n % n_shards != 0:
        raise ValueError(f"slab rows {n} must divide across {n_shards}")
    rows = n // n_shards
    k_local = min(k, rows)

    def local(q, v_shard, s_shard, m_shard, slots, lvals):
        shard_id = jax.lax.axis_index(axes[-1])
        stride = mesh.shape[axes[-1]]
        for a in reversed(axes[:-1]):
            shard_id = shard_id + jax.lax.axis_index(a) * stride
            stride = stride * mesh.shape[a]
        base = shard_id * rows

        q32 = q.astype(jnp.float32)
        emb = jax.lax.dot_general(
            q32, v_shard.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) * s_shard[:, 0][None, :]
        masked_emb = jnp.where(m_shard[None, :], emb, NEG_INF)
        if rows >= 65536:
            from rust_local_rag_tpu.ops.fast_topk import (
                segmented_exact_topk_scores,
            )

            e_vals, e_idx = segmented_exact_topk_scores.__wrapped__(
                masked_emb, k_local
            )
        else:
            e_vals, e_idx = jax.lax.top_k(masked_emb, k_local)
        e_idx = jnp.where(e_vals == NEG_INF, -1, e_idx.astype(jnp.int32))

        # lexical union on this shard (global normalization)
        lex_pad = slots < 0
        lv = jnp.where(lex_pad, 0.0, lvals.astype(jnp.float32))
        max_lex = jnp.maximum(
            jnp.max(lv, axis=1, keepdims=True), jnp.float32(1.1920929e-07)
        )
        lexn_sparse = lv / max_lex
        local_slot = slots - base
        on_shard = (~lex_pad) & (local_slot >= 0) & (local_slot < rows)
        safe_slots = jnp.where(on_shard, local_slot, 0)
        l_emb = jnp.take_along_axis(masked_emb, safe_slots, axis=1)
        dup = jnp.any(
            jnp.where(on_shard, local_slot, -2)[:, :, None]
            == jnp.where(e_idx < 0, -3, e_idx)[:, None, :],
            axis=2,
        )
        l_dead = (~on_shard) | dup | ~jnp.isfinite(l_emb)

        match_e = e_idx[:, :, None] == jnp.where(
            on_shard, local_slot, -2
        )[:, None, :]
        e_lexn = jnp.sum(
            jnp.where(match_e, lexn_sparse[:, None, :], 0.0), axis=2
        )
        e_comb = jnp.where(
            e_idx < 0, NEG_INF, w_embedding * e_vals + w_lexical * e_lexn
        )
        l_comb = jnp.where(
            l_dead, NEG_INF,
            w_embedding * l_emb + w_lexical * lexn_sparse,
        )

        all_comb = jnp.concatenate([e_comb, l_comb], axis=1)
        all_emb = jnp.concatenate([e_vals, l_emb], axis=1)
        all_lexn = jnp.concatenate([e_lexn, lexn_sparse], axis=1)
        g_local = jnp.concatenate(
            [e_idx, jnp.where(on_shard, local_slot, -1)], axis=1
        )
        s_vals, sel = jax.lax.top_k(all_comb, k_local)
        s_emb = jnp.take_along_axis(all_emb, sel, axis=1)
        s_lexn = jnp.take_along_axis(all_lexn, sel, axis=1)
        g_all = jnp.where(g_local >= 0, g_local + base, -1)
        s_idx = jnp.take_along_axis(g_all, sel, axis=1)
        s_idx = jnp.where(s_vals == NEG_INF, -1, s_idx)

        q_n = q.shape[0]
        vals, emb_k, lex_k, idx = s_vals, s_emb, s_lexn, s_idx
        for a in reversed(axes):
            av = jax.lax.all_gather(vals, a)
            ae = jax.lax.all_gather(emb_k, a)
            al = jax.lax.all_gather(lex_k, a)
            ai = jax.lax.all_gather(idx, a)
            fv = jnp.transpose(av, (1, 0, 2)).reshape(q_n, -1)
            fe = jnp.transpose(ae, (1, 0, 2)).reshape(q_n, -1)
            fl = jnp.transpose(al, (1, 0, 2)).reshape(q_n, -1)
            fi = jnp.transpose(ai, (1, 0, 2)).reshape(q_n, -1)
            kk = min(k, fv.shape[1])
            vals, sel2 = jax.lax.top_k(fv, kk)
            emb_k = jnp.take_along_axis(fe, sel2, axis=1)
            lex_k = jnp.take_along_axis(fl, sel2, axis=1)
            idx = jnp.take_along_axis(fi, sel2, axis=1)
        if kk < k:
            pad = k - kk
            vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=NEG_INF)
            emb_k = jnp.pad(emb_k, ((0, 0), (0, pad)))
            lex_k = jnp.pad(lex_k, ((0, 0), (0, pad)))
            idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
        idx = jnp.where(vals == NEG_INF, -1, idx)
        return vals, emb_k, lex_k, idx.astype(jnp.int32)

    qspec = P(data_axis, None) if data_axis else P()
    cspec = axes if len(axes) > 1 else axes[0]
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            qspec, P(cspec, None), P(cspec, None),
            P(cspec), qspec, qspec,
        ),
        out_specs=(qspec, qspec, qspec, qspec),
        check_vma=False,
    )
    return fn(queries, values, scales, valid_mask, lex_slots, lex_vals)


def shard_corpus(corpus, mesh: Mesh, corpus_axis: str = "corpus"):
    """Place a [N, D] host/global array row-sharded over the mesh."""
    sharding = NamedSharding(mesh, P(corpus_axis, None))
    return jax.device_put(corpus, sharding)


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


@functools.partial(jax.jit, static_argnames=("k", "mesh", "corpus_axis", "tile_n"))
def sharded_topk_jit(
    queries, corpus, k: int, mesh: Mesh, corpus_axis: str = "corpus",
    tile_n: int = 65536, valid_count=None,
):
    return sharded_topk(
        queries, corpus, k, mesh, corpus_axis=corpus_axis, tile_n=tile_n,
        valid_count=valid_count,
    )
