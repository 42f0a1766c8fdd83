"""Retrieval engine: HBM chunk store, RagEngine orchestration, persistence."""

from rust_local_rag_tpu.engine.chunk_store import ChunkStore, ChunkMeta  # noqa: F401
from rust_local_rag_tpu.engine.rag_engine import RagEngine, SearchResult  # noqa: F401
