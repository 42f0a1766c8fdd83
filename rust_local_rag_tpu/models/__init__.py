"""On-TPU models: embedding encoder, cross-scoring reranker, and
deterministic fakes for hermetic tests."""

from rust_local_rag_tpu.models.fake_encoder import HashEncoder  # noqa: F401
from rust_local_rag_tpu.models.embedding_service import EmbeddingService  # noqa: F401
