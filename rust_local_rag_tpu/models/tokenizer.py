"""Tokenization for the on-TPU models.

Two backends:
  * HfTokenizer — wraps a HuggingFace `tokenizers` JSON file when one is
    available locally (TOKENIZER_PATH env or explicit path). No network.
  * HashTokenizer — deterministic, vocabulary-free: word pieces are hashed
    into a fixed id space. Fully hermetic (tests, air-gapped deployments)
    and stable across processes.

Both produce fixed-shape [batch, max_len] int32 id matrices + masks, because
XLA wants static shapes; bucketed padding keeps recompiles bounded.
"""

from __future__ import annotations

import hashlib
import os
import re
from typing import List, Optional, Sequence, Tuple

import numpy as np

# Reserved ids for the hash tokenizer
PAD_ID = 0
CLS_ID = 1
SEP_ID = 2
UNK_ID = 3
_N_SPECIAL = 4

_WORD_RE = re.compile(r"[A-Za-z0-9]+|[^\sA-Za-z0-9]")

# Padding buckets: sequences pad up to the nearest bucket to bound the
# number of distinct compiled shapes.
DEFAULT_BUCKETS = (64, 128, 256, 512)


def bucket_length(n: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def bucket_batch(n: int) -> int:
    """Round a batch dimension up to a power of two (bounds the number of
    compiled batch shapes; padded rows are dropped by the caller)."""
    b = 1
    while b < n:
        b *= 2
    return b


def headtail_pack(
    rows: Sequence[Sequence[int]], seq_len: int, pad_id: int = PAD_ID
) -> Tuple[np.ndarray, np.ndarray]:
    """Pack untruncated token rows into fixed [B, seq_len] with the judge
    trainer's truncation: rows longer than seq_len keep the HEAD seq_len//3
    + the TAIL remainder, so the trailing yes/no question and "Answer:" cue
    survive (training/train_reranker.py PromptPairBatcher._encode). The
    serving judge MUST encode through this same function: round 4 traced the
    rejection-gate leak (junk yes-p 0.65 at serve vs 0.07 in training) to
    serving head-only truncation at max_len=512 — every long prompt was
    judged at RoPE positions and cut points the judge never trained on."""
    B = len(rows)
    ids = np.full((B, seq_len), pad_id, dtype=np.int32)
    mask = np.zeros((B, seq_len), dtype=np.int32)
    head = seq_len // 3
    for b, r in enumerate(rows):
        r = list(r)
        if len(r) > seq_len:
            r = r[:head] + r[-(seq_len - head):]
        ids[b, : len(r)] = r
        mask[b, : len(r)] = 1
    return ids, mask


class HashTokenizer:
    """Deterministic hashing tokenizer (vocab-free).

    Each lowercase word maps to `_N_SPECIAL + blake2b(word) % (vocab - 4)`.
    Collisions are rare at vocab 30k for natural text and irrelevant for the
    retrieval-stack plumbing this backs.
    """

    def __init__(self, vocab_size: int = 30528, max_len: int = 512):
        self.vocab_size = vocab_size
        self.max_len = max_len

    def tokenize(self, text: str) -> List[int]:
        ids = [CLS_ID]
        for w in _WORD_RE.findall(text.lower()):
            h = int.from_bytes(
                hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(), "little"
            )
            ids.append(_N_SPECIAL + h % (self.vocab_size - _N_SPECIAL))
            if len(ids) >= self.max_len - 1:
                break
        ids.append(SEP_ID)
        return ids

    def tokenize_full(self, text: str) -> List[int]:
        """Untruncated ids (head/tail packing needs the real tail)."""
        ids = [CLS_ID]
        for w in _WORD_RE.findall(text.lower()):
            h = int.from_bytes(
                hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(), "little"
            )
            ids.append(_N_SPECIAL + h % (self.vocab_size - _N_SPECIAL))
        ids.append(SEP_ID)
        return ids

    def encode_batch_headtail(
        self, texts: Sequence[str], seq_len: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Fixed-shape [B, seq_len] judge encoding (see headtail_pack)."""
        return headtail_pack(
            [self.tokenize_full(t) for t in texts], seq_len, PAD_ID
        )

    def encode_batch(
        self, texts: Sequence[str], buckets: Sequence[int] = DEFAULT_BUCKETS
    ) -> Tuple[np.ndarray, np.ndarray]:
        """-> (ids [B, L], mask [B, L]) padded to a bucketed length."""
        tokenized = [self.tokenize(t) for t in texts]
        longest = max((len(t) for t in tokenized), default=1)
        L = bucket_length(min(longest, self.max_len), buckets)
        ids = np.full((len(texts), L), PAD_ID, dtype=np.int32)
        mask = np.zeros((len(texts), L), dtype=np.int32)
        for i, toks in enumerate(tokenized):
            toks = toks[:L]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return ids, mask


class HfTokenizer:
    """Local HuggingFace `tokenizers` JSON file (no hub access)."""

    def __init__(self, path: str, max_len: int = 512):
        from tokenizers import Tokenizer  # local wheel, no network

        self._tok = Tokenizer.from_file(path)
        self.vocab_size = self._tok.get_vocab_size()
        self.max_len = max_len

    def tokenize(self, text: str) -> List[int]:
        return self._tok.encode(text).ids[: self.max_len]

    def tokenize_full(self, text: str) -> List[int]:
        return self._tok.encode(text).ids

    def encode_batch_headtail(
        self, texts: Sequence[str], seq_len: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Fixed-shape [B, seq_len] judge encoding (see headtail_pack) —
        byte-identical to the trainer's PromptPairBatcher._encode."""
        pad = self._tok.token_to_id("[PAD]")
        rows = [e.ids for e in self._tok.encode_batch(list(texts))]
        return headtail_pack(rows, seq_len, pad if pad is not None else 0)

    def encode_batch(
        self, texts: Sequence[str], buckets: Sequence[int] = DEFAULT_BUCKETS
    ) -> Tuple[np.ndarray, np.ndarray]:
        encs = self._tok.encode_batch(list(texts))
        tokenized = [e.ids[: self.max_len] for e in encs]
        longest = max((len(t) for t in tokenized), default=1)
        L = bucket_length(min(longest, self.max_len), buckets)
        ids = np.zeros((len(texts), L), dtype=np.int32)
        mask = np.zeros((len(texts), L), dtype=np.int32)
        for i, toks in enumerate(tokenized):
            toks = toks[:L]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return ids, mask


def load_tokenizer(
    path: Optional[str] = None, vocab_size: int = 30528, max_len: int = 512
):
    """Native WordPiece kernel (bit-identical, ~30x on the single-core
    host) when native/librag_native.so carries it, else HfTokenizer, when
    a local tokenizer.json is available; else the deterministic hash
    tokenizer. RAG_TPU_NATIVE_TOKENIZER=0 forces the HF backend."""
    path = path or os.environ.get("TOKENIZER_PATH")
    if path and os.path.exists(path):
        if os.environ.get("RAG_TPU_NATIVE_TOKENIZER", "1") != "0":
            try:
                from rust_local_rag_tpu.models.native_tokenizer import (
                    NativeWordPieceTokenizer,
                )

                return NativeWordPieceTokenizer(path, max_len=max_len)
            except (RuntimeError, ImportError):
                pass
        return HfTokenizer(path, max_len=max_len)
    return HashTokenizer(vocab_size=vocab_size, max_len=max_len)
