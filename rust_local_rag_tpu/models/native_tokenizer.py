"""ctypes bindings for the native WordPiece tokenizer (native/wordpiece.cpp).

Drop-in replacement for models/tokenizer.HfTokenizer on the ingest and
serving hot paths. The C++ kernel implements the exact serving pipeline
(assets/tokenizer.json) for pure-ASCII inputs — where NFD and StripAccents
are identity and Lowercase is a byte map — and every text outside that
envelope (non-ASCII bytes, control characters, literal special-token
strings like "[CLS]") is routed to the wrapped HuggingFace backend, so
the combined tokenizer is bit-identical to HfTokenizer on ALL inputs
(tests/test_native_tokenizer.py fuzzes the equivalence). The corpus this
framework serves (technical English manuals, reference
/root/reference/src/rag_engine.rs:1102-1357 chunking domain) is
overwhelmingly ASCII, so the fallback is cold.

Motivation: the single-core host is the full-pipeline ingest bottleneck
(BENCH r4: tokenize 2.19 s of a 2.92 s wall), and the HF pipeline pays
for generality this deployment never uses.
"""

from __future__ import annotations

import ctypes
import json
import os
import re
from typing import List, Optional, Sequence, Tuple

import numpy as np

from rust_local_rag_tpu.models.tokenizer import (
    DEFAULT_BUCKETS,
    HfTokenizer,
    bucket_length,
    headtail_pack,
)

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "librag_native.so",
)

_lib: Optional[ctypes.CDLL] = None

# Inputs the C++ kernel must not see: anything outside printable ASCII +
# the whitespace bytes it knows, or a literal special-token string (the
# HF AddedVocabulary matches those verbatim in RAW text — pre-tokenizer
# splitting never gets the chance to break them up).
_FALLBACK_RE = re.compile(
    r"[^\x20-\x7e\t\n\r\v\f]|\[(?:PAD|UNK|CLS|SEP|MASK)\]"
)


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    if not hasattr(lib, "wp_create"):  # stale .so without the kernel
        return None
    lib.wp_create.restype = ctypes.c_void_p
    lib.wp_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32,
    ]
    lib.wp_destroy.argtypes = [ctypes.c_void_p]
    lib.wp_encode_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_int32, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeWordPieceTokenizer:
    """HfTokenizer-compatible tokenizer backed by native/wordpiece.cpp.

    Exposes the same surface the rest of the stack uses (``tokenize``,
    ``encode_batch``, ``vocab_size``, ``max_len``, and the raw ``_tok``
    the trainers reach for), with the HF object constructed lazily only
    when a fallback-route text or a ``_tok`` access demands it.
    """

    def __init__(self, path: str, max_len: int = 512):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native librag_native.so with wp_create not available"
            )
        self._lib = lib
        self._path = path
        self.max_len = max_len
        with open(path, "r", encoding="utf-8") as f:
            spec = json.load(f)
        vocab = spec["model"]["vocab"]
        n = len(vocab)
        by_id: List[Optional[str]] = [None] * n
        for tok_str, tid in vocab.items():
            by_id[int(tid)] = tok_str
        yes_id = -1
        for added in spec.get("added_tokens") or []:
            if added.get("special"):
                continue  # specials live in the vocab already
            if added["content"] == "yes":
                yes_id = int(added["id"])
                if yes_id >= n:
                    # reserve the id slot with a piece the kernel can
                    # never match (non-ASCII bytes never reach it)
                    by_id.append("￿-added-token-slot")
                    n += 1
            else:  # an added token the kernel doesn't model
                raise RuntimeError(
                    f"unsupported added token {added['content']!r}"
                )
        self.vocab_size = n

        def tid(tok_str: str) -> int:
            v = vocab.get(tok_str)
            if v is None:
                raise RuntimeError(f"vocab missing {tok_str}")
            return int(v)

        blob = b"\0".join(t.encode("utf-8") for t in by_id) + b"\0"
        self._handle = lib.wp_create(
            blob, len(blob), n,
            tid("[CLS]"), tid("[SEP]"), tid("[UNK]"), yes_id,
            int(spec["model"].get("max_input_chars_per_word") or 64),
        )
        self._hf: Optional[HfTokenizer] = None

    def __del__(self):
        h = getattr(self, "_handle", None)
        if h:
            self._lib.wp_destroy(h)
            self._handle = None

    @property
    def _fallback(self) -> HfTokenizer:
        if self._hf is None:
            self._hf = HfTokenizer(self._path, max_len=self.max_len)
        return self._hf

    @property
    def _tok(self):
        return self._fallback._tok

    def _encode_native(
        self, texts: Sequence[str], max_len: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """-> (ids [B, max_len] zero-padded, lens [B]) for ASCII texts."""
        raw = [t.encode("ascii") for t in texts]
        offsets = np.zeros(len(raw) + 1, dtype=np.int64)
        np.cumsum([len(b) for b in raw], out=offsets[1:])
        blob = b"".join(raw)
        ids = np.zeros((len(raw), max_len), dtype=np.int32)
        lens = np.zeros(len(raw), dtype=np.int32)
        self._lib.wp_encode_batch(
            self._handle, blob, offsets, len(raw), max_len, ids, lens
        )
        return ids, lens

    def tokenize(self, text: str) -> List[int]:
        if _FALLBACK_RE.search(text):
            return self._fallback.tokenize(text)
        ids, lens = self._encode_native([text], self.max_len)
        return ids[0, : int(lens[0])].tolist()

    def encode_batch_headtail(
        self, texts: Sequence[str], seq_len: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Fixed-shape [B, seq_len] judge encoding (tokenizer.headtail_pack)
        — same bytes as HfTokenizer.encode_batch_headtail. The native kernel
        encodes into a generous fixed buffer; any row that fills it (so its
        true tail is unknown) reroutes to the HF backend for untruncated
        ids."""
        texts = list(texts)
        cap = max(1024, 2 * seq_len)
        fb = set(i for i, t in enumerate(texts) if _FALLBACK_RE.search(t))
        nat_idx = [i for i in range(len(texts)) if i not in fb]
        rows: List[List[int]] = [[] for _ in texts]
        if nat_idx:
            ids, lens = self._encode_native(
                [texts[i] for i in nat_idx], cap
            )
            for j, i in enumerate(nat_idx):
                if int(lens[j]) >= cap:
                    fb.add(i)
                else:
                    rows[i] = ids[j, : int(lens[j])].tolist()
        if fb:
            encs = self._tok.encode_batch([texts[i] for i in sorted(fb)])
            for i, e in zip(sorted(fb), encs):
                rows[i] = e.ids
        pad = self._tok.token_to_id("[PAD]") if fb else 0
        # the shipped tokenizer.json puts [PAD] at 0; the native buffer is
        # zero-padded, so the two agree without forcing an HF construction
        return headtail_pack(rows, seq_len, pad if pad is not None else 0)

    def encode_batch(
        self, texts: Sequence[str], buckets: Sequence[int] = DEFAULT_BUCKETS
    ) -> Tuple[np.ndarray, np.ndarray]:
        """-> (ids [B, L], mask [B, L]) padded to a bucketed length —
        same contract (and same bytes) as HfTokenizer.encode_batch."""
        texts = list(texts)
        fb_idx = [i for i, t in enumerate(texts) if _FALLBACK_RE.search(t)]
        nat_idx = (
            [i for i in range(len(texts)) if i not in set(fb_idx)]
            if fb_idx
            else list(range(len(texts)))
        )
        nat_ids, nat_lens = self._encode_native(
            [texts[i] for i in nat_idx], self.max_len
        )
        fb_rows: List[List[int]] = []
        if fb_idx:
            encs = self._tok.encode_batch([texts[i] for i in fb_idx])
            fb_rows = [e.ids[: self.max_len] for e in encs]
        longest = max(
            (int(nat_lens.max()) if nat_idx else 1),
            max((len(r) for r in fb_rows), default=1),
        )
        L = bucket_length(min(longest, self.max_len), buckets)
        ids = np.zeros((len(texts), L), dtype=np.int32)
        mask = np.zeros((len(texts), L), dtype=np.int32)
        if nat_idx:
            rows = np.asarray(nat_idx)
            take = nat_ids[:, :L]
            lens = np.minimum(nat_lens, L)
            ids[rows] = take
            mask[rows] = (np.arange(L)[None, :] < lens[:, None]).astype(
                np.int32
            )
            if int(nat_lens.max()) > L:  # re-zero ids past the truncation
                ids[rows] *= mask[rows]
        for i, row in zip(fb_idx, fb_rows):
            row = row[:L]
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        return ids, mask
