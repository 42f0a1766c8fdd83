"""Multi-chip parallelism: mesh construction, corpus-sharded exact search,
and distributed encoder training (DP+TP)."""

from rust_local_rag_tpu.parallel.mesh import build_mesh  # noqa: F401
from rust_local_rag_tpu.parallel.sharded_search import sharded_topk  # noqa: F401
