"""Device-side retrieval ops: similarity, streaming top-k, MMR, BM25 blend."""

from rust_local_rag_tpu.ops.similarity import (  # noqa: F401
    normalize,
    normalize_rows,
    cosine_similarity,
    dense_scores,
    blend_scores,
)
from rust_local_rag_tpu.ops.topk import exact_topk, streaming_topk  # noqa: F401
from rust_local_rag_tpu.ops.mmr import mmr_select  # noqa: F401
