"""Deterministic fake encoder for hermetic tests and air-gapped runs.

The reference has no mock for its Ollama embedding service — anything
touching embeddings is either unit-tested below the service boundary or
deferred to a live eval (SURVEY.md §4 "fake-backend gap"). This encoder
closes that gap: fully deterministic across processes, no weights, no
network, and similar texts get similar vectors (hashed bag-of-words with
positional n-gram salt), so retrieval behavior is realistic enough to test
ranking, MMR, blending and the eval harness end to end.
"""

from __future__ import annotations

import hashlib
import re
from typing import Sequence

import numpy as np

_WORD_RE = re.compile(r"[a-z0-9]+")


def _token_vector(token: str, dim: int) -> np.ndarray:
    """Deterministic pseudo-random unit-ish vector for a token."""
    seed = int.from_bytes(
        hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "little"
    )
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


class HashEncoder:
    """Vocabulary-free deterministic text encoder.

    embedding(text) = L2-normalized sum of token vectors (tf-weighted) plus
    a small bigram component for word-order sensitivity.
    """

    def __init__(self, dim: int = 768, model_name: str = "fake-hash-encoder"):
        self.dim = dim
        self._model_name = model_name
        self._cache: dict[str, np.ndarray] = {}
        self._cache_cap = 50_000

    @property
    def model_name(self) -> str:
        return self._model_name

    def _tok_vec(self, token: str) -> np.ndarray:
        v = self._cache.get(token)
        if v is None:
            v = _token_vector(token, self.dim)
            if len(self._cache) < self._cache_cap:
                self._cache[token] = v
        return v

    def encode_one(self, text: str) -> np.ndarray:
        words = _WORD_RE.findall(text.lower())
        acc = np.zeros(self.dim, dtype=np.float32)
        for w in words:
            acc += self._tok_vec(w)
        for a, b in zip(words, words[1:]):
            acc += 0.25 * self._tok_vec(a + "##" + b)
        norm = float(np.linalg.norm(acc))
        if norm > 1e-10:
            acc /= norm
        return acc

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dim), dtype=np.float32)
        return np.stack([self.encode_one(t) for t in texts])

    # duck-type parity with the transformer encoder
    def encode_queries(self, texts: Sequence[str]) -> np.ndarray:
        return self.encode(texts)
