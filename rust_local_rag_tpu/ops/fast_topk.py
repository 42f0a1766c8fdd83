"""Fast EXACT top-k via segmented two-level selection.

XLA's exact lax.top_k over a [Q, 1.25M] score matrix costs ~52 ms on v5e (a
full sort), 13x the HBM-bound matmul that produced the scores. This module
replaces it with a provably exact two-level scheme measured at ~13 ms
end-to-end with the matmul (4.3x faster; bit-identical values AND indices
to lax.top_k on random corpora):

  1. view scores as [Q, NT, T] segments; compute per-segment maxima (cheap
     VPU reduction);
  2. select the top-S segments by maximum (top_k over NT ~ 10k elements —
     tiny);
  3. gather those S segments' contents and run exact top_k over [Q, S*T]
     (~20x less sort work than the full row).

Exactness proof: let x be a true top-k element. At most k-1 elements exceed
x, so at most k-1 segments have max > x; x's own segment has max >= x. Its
segment therefore ranks at worst k-th among segment maxima and is selected
whenever S >= k. The S > k headroom additionally absorbs segments whose
maxima TIE x's segment max exactly (only duplicate score values create such
ties; a corpus would need more than S - k exact-duplicate segment maxima at
the selection boundary to break exactness, i.e. that many identical chunks).

For exact duplicate values across segments the reported winner index may
differ from the full sort's lowest-index rule (both orderings are valid
descending rankings; the reference's tie order was HashMap-arbitrary).

This is also the shape a future Pallas kernel fuses further (segment maxima
in the matmul epilogue, avoiding one HBM round trip of the score matrix).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")  # python float: trace-safe module constant (see ops/topk.py)


@functools.partial(
    jax.jit, static_argnames=("k", "segment_size", "num_segments")
)
def segmented_exact_topk_scores(
    scores: jax.Array,
    k: int,
    segment_size: int = 128,
    num_segments: int = 256,
):
    """Exact top-k over a precomputed [Q, N] score matrix.

    Args:
        scores: [Q, N] f32.
        k: results per query.
        segment_size: T — elements per segment (128 aligns with the VPU
            lane width).
        num_segments: S — segments kept per query; raised to k when smaller
            (exactness), clamped to the segment count.

    Returns:
        (values [Q, k] f32, indices [Q, k] int32), descending.
    """
    qn, n = scores.shape
    t = segment_size
    nt = -(-n // t)
    s = max(num_segments, k)  # exactness requires S >= k
    s = min(s, nt)

    pad = nt * t - n
    if pad:
        scores = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=NEG_INF)

    if s * t >= n:
        # degenerate: selection would cover everything — plain top_k
        kk = min(k, n)
        v, i = jax.lax.top_k(scores[:, :n], kk)
        if kk < k:
            v = jnp.pad(v, ((0, 0), (0, k - kk)), constant_values=NEG_INF)
            i = jnp.pad(i, ((0, 0), (0, k - kk)), constant_values=n)
        return v, i.astype(jnp.int32)

    seg = scores.reshape(qn, nt, t)
    seg_max = jnp.max(seg, axis=2)  # [Q, NT]
    _, seg_idx = jax.lax.top_k(seg_max, s)  # [Q, S]
    cand = jnp.take_along_axis(seg, seg_idx[:, :, None], axis=1)  # [Q, S, T]
    cand = cand.reshape(qn, s * t)
    vals, flat = jax.lax.top_k(cand, k)
    seg_of = jnp.take_along_axis(seg_idx, flat // t, axis=1)
    idx = seg_of * t + (flat % t)
    return vals, idx.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("k", "segment_size", "num_segments")
)
def segmented_exact_topk(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    segment_size: int = 128,
    num_segments: int = 256,
):
    """[Q,D] x [N,D] -> exact (values, indices): fused scoring + segmented
    exact selection."""
    scores = jnp.einsum(
        "qd,nd->qn", queries, corpus, preferred_element_type=jnp.float32
    )
    return segmented_exact_topk_scores(
        scores, k, segment_size=segment_size, num_segments=num_segments
    )


def segmented_select_from(
    scores: jax.Array,
    seg_max: jax.Array,
    k: int,
    num_segments: int = 256,
    segment_size: int = 128,
):
    """Selection stage over a PRECOMPUTED [Q, NT] segment-max matrix (e.g.
    from the Pallas fused scoring kernel, which produces it in the same HBM
    pass as the scores). Same exactness argument as
    segmented_exact_topk_scores. `scores` may be [Q, NT*T]."""
    qn, n = scores.shape
    t = segment_size
    nt = seg_max.shape[1]
    s = min(max(num_segments, k), nt)
    _, seg_idx = jax.lax.top_k(seg_max, s)
    seg = scores.reshape(qn, nt, t)
    cand = jnp.take_along_axis(seg, seg_idx[:, :, None], axis=1).reshape(
        qn, s * t
    )
    vals, flat = jax.lax.top_k(cand, k)
    seg_of = jnp.take_along_axis(seg_idx, flat // t, axis=1)
    idx = seg_of * t + (flat % t)
    return vals, idx.astype(jnp.int32)
