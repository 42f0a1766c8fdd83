"""rust_local_rag_tpu — a TPU-native local-RAG framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the Rust
reference `CrashCartCapital/rust-local-rag` (see SURVEY.md): PDF ingest with
sentence-aware chunking, hybrid dense+BM25 retrieval with per-query weight
overrides, MMR diversification, two-stage LLM reranking, model-partitioned
index persistence, a background job system, and an MCP + HTTP API surface.

Unlike the reference (CPU brute force + per-candidate Ollama HTTP), the
retrieval math here runs on TPU: the corpus is a packed device matrix in HBM,
scoring/top-k/MMR are fused device programs, embedding and reranking are
batched on-device model passes, and large corpora shard row-wise over an ICI
mesh with an exact per-shard-top-k + all-gather merge.

Package layout:
    ops/       device kernels: similarity, streaming exact top-k, MMR, BM25
    models/    on-TPU encoder + reranker (and deterministic fakes for tests)
    parallel/  mesh construction, corpus-sharded search, distributed training
    engine/    chunk store (HBM slab), RagEngine, persistence
    ingest/    PDF extraction, sentence-aware chunking
    jobs/      SQLite job manager, worker supervisor, progress logger
    server/    HTTP JSON + MCP streamable-HTTP API
    utils/     logging, LRU cache, misc
"""

__version__ = "0.1.0"
