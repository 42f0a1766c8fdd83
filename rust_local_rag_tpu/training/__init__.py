"""In-framework model training.

The reference outsources all model quality to Ollama-served pretrained
checkpoints (embeddings.rs:60-182, reranker.rs:113-771). A TPU-native
deployment has no Ollama; this package is where embedding/reranker quality
comes from instead: a local-text corpus harvester, a WordPiece tokenizer
trainer, and contrastive/classification training loops (built on
parallel/train.py's distributed step) that produce the committed
`assets/` checkpoints the serving stack loads by default.
"""
