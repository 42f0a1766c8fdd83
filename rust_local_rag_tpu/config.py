"""Environment-variable configuration with validated, cached scoring weights.

Mirrors the reference's config contract (rag_engine.rs:1801-1841, main.rs:19-58):
four scoring weights validated to be finite and in [0, 1], cached after first
read (OnceLock semantics); directory and batch-size knobs under the same env
var names so a reference deployment's .env keeps working.
"""

from __future__ import annotations

import os
from typing import Optional

# Defaults match the reference (rag_engine.rs:1801-1804).
DEFAULT_EMBEDDING_WEIGHT = 0.7
DEFAULT_LEXICAL_WEIGHT = 0.3
DEFAULT_RERANKER_WEIGHT = 0.7
DEFAULT_INITIAL_SCORE_WEIGHT = 0.3

# Reference clamps top_k to 100 (mcp_server.rs:364).
MAX_TOP_K = 100

_weight_cache: dict[str, float] = {}


def _parse_weight(env_var: str, default: float) -> float:
    """Parse a weight env var; invalid (non-finite / out of [0,1]) -> default.

    Mirrors parse_weight (rag_engine.rs:1813-1819).
    """
    raw = os.environ.get(env_var)
    if raw is None:
        return default
    try:
        w = float(raw)
    except ValueError:
        return default
    if w != w or w in (float("inf"), float("-inf")) or not (0.0 <= w <= 1.0):
        return default
    return w


def _cached_weight(env_var: str, default: float) -> float:
    if env_var not in _weight_cache:
        _weight_cache[env_var] = _parse_weight(env_var, default)
    return _weight_cache[env_var]


def reset_weight_cache() -> None:
    """Test hook: clear the OnceLock-style cache."""
    _weight_cache.clear()


def get_embedding_weight() -> float:
    return _cached_weight("RAG_EMBEDDING_WEIGHT", DEFAULT_EMBEDDING_WEIGHT)


def get_lexical_weight() -> float:
    return _cached_weight("RAG_LEXICAL_WEIGHT", DEFAULT_LEXICAL_WEIGHT)


def get_reranker_weight() -> float:
    return _cached_weight("RAG_RERANKER_WEIGHT", DEFAULT_RERANKER_WEIGHT)


def get_initial_score_weight() -> float:
    return _cached_weight("RAG_INITIAL_SCORE_WEIGHT", DEFAULT_INITIAL_SCORE_WEIGHT)


def resolve_weight(override: Optional[float], default: float) -> float:
    """Use override if finite and in [0,1], else default (rag_engine.rs:1869-1873)."""
    if override is None:
        return default
    try:
        w = float(override)
    except (TypeError, ValueError):
        return default
    if w != w or w in (float("inf"), float("-inf")) or not (0.0 <= w <= 1.0):
        return default
    return w


class QueryWeights:
    """Optional per-query weight overrides (rag_engine.rs:1846-1865).

    All fields optional; invalid values are silently ignored in favor of the
    cached env defaults.
    """

    __slots__ = ("embedding", "lexical", "reranker", "initial")

    def __init__(
        self,
        embedding: Optional[float] = None,
        lexical: Optional[float] = None,
        reranker: Optional[float] = None,
        initial: Optional[float] = None,
    ):
        self.embedding = embedding
        self.lexical = lexical
        self.reranker = reranker
        self.initial = initial

    @classmethod
    def from_dict(cls, d: Optional[dict]) -> "QueryWeights":
        if not d:
            return cls()
        return cls(
            embedding=d.get("embedding"),
            lexical=d.get("lexical"),
            reranker=d.get("reranker"),
            initial=d.get("initial"),
        )


class ResolvedWeights:
    """Effective weights after override validation (rag_engine.rs:1878-1896)."""

    __slots__ = ("embedding", "lexical", "reranker", "initial")

    def __init__(self, embedding: float, lexical: float, reranker: float, initial: float):
        self.embedding = embedding
        self.lexical = lexical
        self.reranker = reranker
        self.initial = initial

    @classmethod
    def from_query_weights(cls, weights: Optional[QueryWeights]) -> "ResolvedWeights":
        w = weights
        return cls(
            embedding=resolve_weight(w.embedding if w else None, get_embedding_weight()),
            lexical=resolve_weight(w.lexical if w else None, get_lexical_weight()),
            reranker=resolve_weight(w.reranker if w else None, get_reranker_weight()),
            initial=resolve_weight(w.initial if w else None, get_initial_score_weight()),
        )


# ----- directories / service knobs (main.rs:19-58, rag_engine.rs:19-33) -----

def get_data_dir() -> str:
    return os.environ.get("DATA_DIR", "./data")


def get_documents_dir() -> str:
    return os.environ.get("DOCUMENTS_DIR", "./documents")


def get_log_dir() -> str:
    env = os.environ.get("LOG_DIR")
    if env:
        return env
    if os.path.isdir("/var/log") and os.access("/var/log", os.W_OK):
        return "/var/log/rust-local-rag-tpu"
    return "./logs"


def get_log_level() -> str:
    return os.environ.get("LOG_LEVEL", "info")


def get_log_max_mb() -> int:
    try:
        return int(os.environ.get("LOG_MAX_MB", "5"))
    except ValueError:
        return 5


def get_batch_size() -> int:
    """Ingest embedding batch size (EMBEDDING_BATCH_SIZE).

    Reference defaults to 32 for a thermally constrained laptop
    (rag_engine.rs:19-24); on TPU a larger batch keeps the MXU fed.
    """
    try:
        return int(os.environ.get("EMBEDDING_BATCH_SIZE", "128"))
    except ValueError:
        return 128


def get_batch_timeout_s() -> float:
    """Hard per-batch embedding timeout during ingest. The reference aborts
    an embed batch after 20 minutes (embeddings.rs:118-140) so one stuck
    call cannot hang a reindex job forever; same default here. 0 disables."""
    try:
        return float(os.environ.get("EMBEDDING_BATCH_TIMEOUT_S", "1200"))
    except ValueError:
        return 1200.0


def get_batch_cooldown_ms() -> int:
    """Cooldown between embed batches (reference: 500ms thermal recovery,
    rag_engine.rs:26-33). TPU default: 0 — no thermal constraint."""
    try:
        return int(os.environ.get("EMBEDDING_BATCH_COOLDOWN_MS", "0"))
    except ValueError:
        return 0


def get_embedding_model() -> str:
    """Embedding model name; also used to partition index files on disk.

    Honors the reference's OLLAMA_EMBEDDING_MODEL for .env migration.
    """
    return (
        os.environ.get("RAG_TPU_EMBEDDING_MODEL")
        or os.environ.get("OLLAMA_EMBEDDING_MODEL")
        or "nomic-embed-text"
    )


def get_rerank_model() -> Optional[str]:
    """Rerank model name; None disables the second stage.

    Honors the reference's OLLAMA_RERANK_MODEL for .env migration.
    """
    return os.environ.get("RAG_TPU_RERANK_MODEL") or os.environ.get("OLLAMA_RERANK_MODEL")


def get_mcp_http_bind() -> str:
    return os.environ.get("MCP_HTTP_BIND", "127.0.0.1:3046")


def get_mcp_http_endpoint() -> str:
    return os.environ.get("MCP_HTTP_ENDPOINT", "/mcp")


def get_prompts_dir() -> str:
    return os.environ.get("PROMPTS_DIR", "./prompts")
