"""Multi-slice corpus sharding: hierarchical exact top-k over ICI + DCN.

SURVEY.md §5.8 plans the scale-out beyond one TPU slice: row-shard the
corpus over a 2-axis ("slice", "ici") mesh where the inner axis rides the
intra-slice interconnect (ICI, ~100s of GB/s) and the outer axis rides the
data-center network between slices (DCN, orders of magnitude slower). The
merge is therefore HIERARCHICAL, minimizing DCN bytes:

  1. every shard computes its exact local top-k (ops/fast_topk math);
  2. intra-slice: one all_gather over "ici" + a local top-k reduces each
     slice to ONE candidate set of k (score, global-index) pairs;
  3. cross-slice: one all_gather over "slice" carries only k pairs per
     slice across DCN; a final top-k merges them.

A flat merge (parallel/sharded_search.sharded_topk) gathers
n_shards * k candidates over EVERY link including DCN; the hierarchy cuts
cross-slice traffic by the ici-axis size (e.g. 8 slices x 4 chips:
32k -> 8k pairs over DCN per query batch).

Exactness: identical to the flat argument (SURVEY.md §7 "Exactness under
sharding") applied twice — a global top-k element on shard s is inside
s's local top-k (k <= rows/shard asserted), hence inside its slice's
merged top-k (slice candidate pool contains s's full local top-k), hence
inside the final merge. Ties break deterministically by (slice, shard)
position order, matching the flat merge's lower-global-index rule because
shards are laid out slice-major.

On one host this compiles and runs on any mesh whose device count matches
(the CPU test mesh uses 2 slices x 4 devices); on real hardware the
"slice" axis maps to jax.experimental.mesh_utils'
create_hybrid_device_mesh DCN axis with the same program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from rust_local_rag_tpu.ops.topk import streaming_topk


def multislice_topk(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    mesh: Mesh,
    slice_axis: str = "slice",
    ici_axis: str = "ici",
    tile_n: int = 65536,
    valid_count: Optional[jax.Array] = None,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
):
    """Exact top-k with the corpus row-sharded over BOTH mesh axes.

    Args:
        queries: [Q, D], replicated everywhere.
        corpus:  [N, D] global corpus; N must divide evenly by the total
                 shard count (slice_size * ici_size).
        k:       results per query; k <= N / num_shards (exact-merge bound).
        valid_count: optional global row count; padded tail rows masked.

    Returns:
        (values [Q, k] f32, global indices [Q, k] int32), replicated.
    """
    n_slices = mesh.shape[slice_axis]
    n_ici = mesh.shape[ici_axis]
    n_shards = n_slices * n_ici
    n = corpus.shape[0]
    if n % n_shards != 0:
        raise ValueError(
            f"corpus rows {n} must divide evenly across {n_shards} shards"
        )
    rows = n // n_shards
    if k > rows:
        raise ValueError(
            f"k={k} exceeds rows per shard {rows}; exact merge needs "
            "k <= shard size"
        )

    vc = jnp.int32(n if valid_count is None else valid_count)

    def local(q, c_shard, vc_arr):
        # shards are laid out slice-major: global shard id = s * ici + i
        s_id = jax.lax.axis_index(slice_axis)
        i_id = jax.lax.axis_index(ici_axis)
        base = (s_id * n_ici + i_id) * rows
        local_valid = jnp.clip(vc_arr[0] - base, 0, rows)

        if rows >= 65536:
            from rust_local_rag_tpu.ops.fast_topk import (
                segmented_exact_topk_scores,
            )

            scores = jnp.einsum(
                "qd,nd->qn", q, c_shard,
                preferred_element_type=jnp.float32, precision=precision,
            )
            col = jax.lax.broadcasted_iota(
                jnp.int32, (q.shape[0], rows), 1
            )
            scores = jnp.where(col < local_valid, scores, -jnp.inf)
            vals, idx = segmented_exact_topk_scores.__wrapped__(scores, k)
        else:
            vals, idx = streaming_topk(
                q, c_shard, k, tile_n=tile_n, valid_count=local_valid,
                precision=precision,
            )
        idx = jnp.where(idx >= rows, rows, idx)
        gidx = base + idx
        qn = q.shape[0]

        # ---- level 1: intra-slice merge over ICI ----
        ici_vals = jax.lax.all_gather(vals, ici_axis)   # [n_ici, Q, k]
        ici_idx = jax.lax.all_gather(gidx, ici_axis)
        fv = jnp.transpose(ici_vals, (1, 0, 2)).reshape(qn, n_ici * k)
        fi = jnp.transpose(ici_idx, (1, 0, 2)).reshape(qn, n_ici * k)
        sv, sel = jax.lax.top_k(fv, k)                  # slice top-k
        si = jnp.take_along_axis(fi, sel, axis=1)

        # ---- level 2: cross-slice merge over DCN (k pairs per slice) ----
        dcn_vals = jax.lax.all_gather(sv, slice_axis)   # [n_slices, Q, k]
        dcn_idx = jax.lax.all_gather(si, slice_axis)
        gv = jnp.transpose(dcn_vals, (1, 0, 2)).reshape(qn, n_slices * k)
        gi = jnp.transpose(dcn_idx, (1, 0, 2)).reshape(qn, n_slices * k)
        mv, msel = jax.lax.top_k(gv, k)
        mi = jnp.take_along_axis(gi, msel, axis=1)
        # re-establish the idx=-1 invariant for masked rows: a -inf value's
        # index is arbitrary (or the `rows` clamp = an out-of-slab global
        # index on the last shard) and must never be gathered by callers —
        # same step as sharded_search.sharded_hybrid_topk
        mi = jnp.where(mv == -jnp.inf, -1, mi)
        return mv, mi

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P((slice_axis, ici_axis), None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(queries, corpus, jnp.asarray([vc], dtype=jnp.int32))
