"""Shared utilities."""

from rust_local_rag_tpu.utils.lru import LruCache  # noqa: F401
