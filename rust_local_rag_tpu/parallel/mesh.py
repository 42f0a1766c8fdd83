"""Device mesh construction.

The reference is single-process with no distributed backend (SURVEY.md §2.4,
§5.8): no NCCL/MPI/Gloo — its only scale axis is one Tokio process. Here the
scale axes are JAX mesh axes over ICI:

  * "corpus" — row-wise shard of the chunk matrix (the long axis: millions
    of chunks). Exactness is preserved by per-shard top-k + all-gather merge
    (sharded_search.py).
  * "data"   — query-batch / training-batch data parallelism.
  * "model"  — tensor parallelism for encoder/reranker weights when a model
    exceeds one chip.

Multi-slice deployments extend the same meshes over DCN with identical
merge semantics (jax device order puts slice-local devices together, so the
"corpus" axis rides ICI within a slice).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh


def build_mesh(
    axis_sizes: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("corpus",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a Mesh over the available devices.

    Default: a 1-D "corpus" mesh over all devices. Pass axis_sizes to
    factor the device array, e.g. build_mesh((2, 4), ("data", "corpus")).
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    total = int(np.prod(axis_sizes))
    if total != len(devices):
        raise ValueError(
            f"axis sizes {axis_sizes} need {total} devices, have {len(devices)}"
        )
    if len(axis_sizes) != len(axis_names):
        raise ValueError("axis_sizes and axis_names length mismatch")
    grid = np.array(devices).reshape(axis_sizes)
    return Mesh(grid, tuple(axis_names))
