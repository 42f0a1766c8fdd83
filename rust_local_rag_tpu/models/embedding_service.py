"""Embedding service: the engine-facing wrapper around an encoder model.

Keeps the reference's EmbeddingService contract (embeddings.rs:24-241) while
swapping HTTP-to-Ollama for on-device batch encoding:
  * 1000-entry LRU cache for query embeddings (embeddings.rs:28,47,91-102);
  * embed_texts() batches through the model; a batch failure falls back to
    sequential one-text encoding (embeddings.rs:169-176);
  * startup verification (verify()) replaces the reference's
    test_connection/verify_model Ollama probes: it embeds a probe string and
    checks the dimension, failing fast like the reference does when Ollama
    is unreachable (tests/exit_codes.rs).
"""

from __future__ import annotations

import concurrent.futures
import logging
import os
import time
from typing import List, Optional, Sequence

import numpy as np

from rust_local_rag_tpu.config import (
    get_batch_cooldown_ms,
    get_batch_size,
    get_batch_timeout_s,
)
from rust_local_rag_tpu.utils.lru import LruCache

logger = logging.getLogger(__name__)

QUERY_CACHE_SIZE = 1000


class EmbeddingService:
    def __init__(self, model, query_cache_size: int = QUERY_CACHE_SIZE):
        """`model` must provide .encode(texts)->[n,d] f32, .model_name, .dim
        (TransformerEncoderModel or HashEncoder)."""
        self._model = model
        self._cache: LruCache[str, np.ndarray] = LruCache(query_cache_size)
        self._executor: Optional[concurrent.futures.ThreadPoolExecutor] = None

    def _encode_with_timeout(self, fn, timeout_s: float):
        """Run one embed call under a hard timeout (embeddings.rs:118-140:
        the reference aborts a batch after 20 min so a stuck backend cannot
        hang a reindex job). On timeout the worker thread is abandoned — a
        wedged device call cannot be interrupted from Python — and a fresh
        executor serves subsequent batches."""
        if timeout_s <= 0:
            return fn()
        if self._executor is None:
            self._executor = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="embed-batch"
            )
        fut = self._executor.submit(fn)
        try:
            return fut.result(timeout=timeout_s)
        except concurrent.futures.TimeoutError:
            self._executor.shutdown(wait=False, cancel_futures=True)
            self._executor = None
            raise RuntimeError(
                f"Embedding batch timed out after {timeout_s:.0f}s"
            ) from None

    @property
    def model_name(self) -> str:
        return self._model.model_name

    @property
    def dim(self) -> int:
        return int(self._model.dim)

    def verify(self) -> None:
        """Fail-fast startup check (replaces Ollama connection+model probe)."""
        probe = self._model.encode(["startup verification probe"])
        if probe.shape != (1, self.dim):
            raise RuntimeError(
                f"Encoder verification failed: got shape {probe.shape}, "
                f"expected (1, {self.dim})"
            )
        logger.info("Embedding model '%s' verified (dim=%d)", self.model_name, self.dim)

    def get_embedding(self, text: str) -> np.ndarray:
        return self._model.encode([text])[0]

    def _encode_queries(self, texts: Sequence[str]) -> np.ndarray:
        """Query-side encoding: models trained with dual task prefixes
        (nomic-embed-text-class) mark queries differently from documents;
        models without encode_queries fall back to plain encode."""
        fn = getattr(self._model, "encode_queries", None)
        if fn is not None:
            return fn(list(texts))
        return self._model.encode(list(texts))

    def get_query_embedding(self, text: str) -> np.ndarray:
        cached = self._cache.get(text)
        if cached is not None:
            return cached
        emb = self._encode_queries([text])[0]
        self._cache.put(text, emb)
        return emb

    def get_query_embeddings(self, texts: Sequence[str]) -> np.ndarray:
        """Batch variant of get_query_embedding: ALL cache misses are
        embedded in ONE model call (a burst of q unseen queries costs one
        encoder forward, not q), and every result enters the LRU."""
        out: List[Optional[np.ndarray]] = [self._cache.get(t) for t in texts]
        missing = [i for i, e in enumerate(out) if e is None]
        if missing:
            embs = self._encode_queries([texts[i] for i in missing])
            for j, i in enumerate(missing):
                out[i] = embs[j]
                self._cache.put(texts[i], embs[j])
        if not out:
            return np.zeros((0, self.dim), dtype=np.float32)
        return np.stack(out)  # type: ignore[arg-type]

    def get_query_embeddings_device(self, texts: Sequence[str]):
        """Device-resident batch query encoding for the search hot path:
        returns a [bucket(n), dim] unit-normalized jax Array still on
        device (padded rows dropped by the caller), or None when the
        model cannot encode on device (hash/fake encoders). Bypasses the
        LRU query cache — the cache contract lives on the host lanes
        (get_query_embedding/s); this lane trades it for skipping one
        device->host round trip per batch."""
        fn = getattr(self._model, "encode_queries_device", None)
        if fn is None:
            return None
        return fn(list(texts))

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        """Batch embed; falls back to sequential on batch failure."""
        if not texts:
            return np.zeros((0, self.dim), dtype=np.float32)
        if len(texts) > 1:
            try:
                out = self._model.encode(list(texts))
                if out.shape[0] == len(texts):
                    return out
                logger.warning(
                    "Batch embedding returned %d embeddings for %d texts, "
                    "falling back to sequential",
                    out.shape[0],
                    len(texts),
                )
            except Exception as e:  # noqa: BLE001
                logger.warning(
                    "Batch embedding failed (%s), falling back to sequential", e
                )
            rows: List[np.ndarray] = []
            for t in texts:
                rows.append(self.get_embedding(t))
            return np.stack(rows)
        return self._model.encode([texts[0]])

    def embed_in_batches(
        self,
        texts: Sequence[str],
        batch_callback=None,
        batch_size: Optional[int] = None,
        cooldown_ms: Optional[int] = None,
    ) -> np.ndarray:
        """Ingest-style batched embedding with the reference's batch/cooldown
        contract (rag_engine.rs:279-336): EMBEDDING_BATCH_SIZE batches,
        EMBEDDING_BATCH_COOLDOWN_MS between them, and a per-batch progress
        callback (batch_idx1, total_batches, total_chunks, chunks_in_batch).
        """
        if not texts:
            return np.zeros((0, self.dim), dtype=np.float32)
        bs = batch_size if batch_size is not None else get_batch_size()
        cooldown = (
            cooldown_ms if cooldown_ms is not None else get_batch_cooldown_ms()
        )
        timeout_s = get_batch_timeout_s()
        total = len(texts)
        total_batches = -(-total // bs)

        # Length-sorted batching: a batch pads to its LONGEST member's
        # sequence bucket, so grouping similar-length chunks avoids paying
        # the max bucket for every batch (mixed corpora would otherwise run
        # entirely at the longest bucket). Original order is restored.
        order = sorted(range(total), key=lambda i: len(texts[i]))

        out = np.zeros((total, self.dim), dtype=np.float32)
        for bi in range(total_batches):
            lo, hi = bi * bs, min((bi + 1) * bs, total)
            idxs = order[lo:hi]
            batch_texts = [texts[i] for i in idxs]
            batch = self._encode_with_timeout(
                lambda bt=batch_texts: self.embed_texts(bt), timeout_s
            )
            if batch.shape[0] != hi - lo:
                raise RuntimeError(
                    f"Batch {bi + 1}/{total_batches}: received "
                    f"{batch.shape[0]} embeddings for {hi - lo} chunks"
                )
            out[np.asarray(idxs, dtype=np.int64)] = batch
            if batch_callback is not None:
                batch_callback(bi + 1, total_batches, total, hi - lo)
            if bi + 1 < total_batches and cooldown > 0:
                time.sleep(cooldown / 1000.0)
        return out


def build_default_service() -> EmbeddingService:
    """Construct the configured encoder: real transformer by default, hash
    encoder when RAG_TPU_FAKE_ENCODER is set (hermetic mode)."""
    from rust_local_rag_tpu.config import get_embedding_model

    name = get_embedding_model()
    if os.environ.get("RAG_TPU_FAKE_ENCODER"):
        from rust_local_rag_tpu.models.fake_encoder import HashEncoder

        dim = int(os.environ.get("RAG_TPU_FAKE_ENCODER_DIM", "768"))
        return EmbeddingService(HashEncoder(dim=dim, model_name=name))
    from rust_local_rag_tpu.models.encoder import TransformerEncoderModel

    return EmbeddingService(TransformerEncoderModel(model_name=name))
