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
