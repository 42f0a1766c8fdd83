"""ctypes bindings for the native C++ BM25 index (native/lexical.cpp).

The index is keyed by integer slots (the ChunkStore slab slots); a thin
adapter maps chunk-id strings to slots so it is interface-compatible with
the pure-Python ops/bm25.LexicalIndex. The native library builds with
`make -C native` (g++, no external deps); when the .so is absent, callers
fall back to the Python index.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Iterable, List, Optional, Set, Tuple

import numpy as np

from rust_local_rag_tpu.ops.bm25 import tokenize as _tokenize

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "librag_native.so",
)

_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.bm25_create.restype = ctypes.c_void_p
    lib.bm25_destroy.argtypes = [ctypes.c_void_p]
    lib.bm25_add_chunk.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
    ]
    lib.bm25_remove_chunk.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.bm25_contains.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.bm25_contains.restype = ctypes.c_int32
    lib.bm25_num_docs.argtypes = [ctypes.c_void_p]
    lib.bm25_num_docs.restype = ctypes.c_int64
    lib.bm25_score.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
    ]
    lib.bm25_score.restype = ctypes.c_int64
    lib.bm25_drop_stale.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    try:
        lib.bm25_compile_all.argtypes = [ctypes.c_void_p]
        lib.bm25_compile_all.restype = ctypes.c_int64
    except AttributeError:
        pass
    try:
        lib.bm25_add_tokens.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.bm25_score_tokens.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
        ]
        lib.bm25_score_tokens.restype = ctypes.c_int64
        lib.bm25_unseen_mass.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.bm25_unseen_mass.restype = ctypes.c_float
    except AttributeError:
        import logging

        logging.getLogger(__name__).warning(
            "native BM25 library at %s predates the pre-tokenized API; "
            "run `make native` to rebuild (using the Python index)",
            _LIB_PATH,
        )
        return None
    _lib = lib
    return lib


def build_native(force: bool = False) -> bool:
    """Build the shared library via make; returns availability."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    native_dir = os.path.dirname(_LIB_PATH)
    try:
        subprocess.run(["make", "-C", native_dir], check=True, capture_output=True)
    except (subprocess.CalledProcessError, OSError):
        return False
    return os.path.exists(_LIB_PATH)


def native_available() -> bool:
    return _load() is not None


class NativeLexicalIndex:
    """Interface-compatible with ops/bm25.LexicalIndex, backed by C++."""

    def __init__(self) -> None:
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native BM25 library not built (run `make -C native`)"
            )
        self._lib = lib
        self._h = ctypes.c_void_p(lib.bm25_create())
        self._id_to_slot: Dict[str, int] = {}
        self._slot_to_id: Dict[int, str] = {}
        # auto-allocated slots start far above any plausible store slot so
        # mixed explicit/auto adds can never collide in _slot_to_id
        self._next_slot = 1 << 40
        # True while every add carried an explicit ChunkStore slot: the
        # native index then scores directly in store-slot space and
        # score_slots_into avoids all per-hit Python (engine hot path)
        self._slots_aligned = True
        self._scratch_slots = np.zeros(0, dtype=np.int64)
        self._scratch_vals = np.zeros(0, dtype=np.float32)

    @property
    def slots_aligned(self) -> bool:
        return self._slots_aligned

    def __del__(self) -> None:
        try:
            if getattr(self, "_h", None):
                self._lib.bm25_destroy(self._h)
                self._h = None
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass

    @property
    def total_docs(self) -> int:
        return int(self._lib.bm25_num_docs(self._h))

    def _slot_for(self, chunk_id: str, slot: int = None) -> int:
        existing = self._id_to_slot.get(chunk_id)
        if slot is not None:
            slot = int(slot)
            if existing is not None and existing != slot:
                self._lib.bm25_remove_chunk(self._h, existing)
                self._slot_to_id.pop(existing, None)
            prior = self._slot_to_id.get(slot)
            if prior is not None and prior != chunk_id:
                # slot reuse after a document replacement: the stale id
                # must not alias the new chunk's postings
                self._id_to_slot.pop(prior, None)
                self._lib.bm25_remove_chunk(self._h, slot)
            self._id_to_slot[chunk_id] = slot
            self._slot_to_id[slot] = chunk_id
            return slot
        self._slots_aligned = False
        if existing is None:
            existing = self._next_slot
            self._next_slot += 1
            self._id_to_slot[chunk_id] = existing
            self._slot_to_id[existing] = chunk_id
        return existing

    def add_chunk(self, chunk_id: str, text: str, slot: int = None) -> None:
        # Tokenize host-side with the Unicode-aware rules (ops/bm25.tokenize,
        # bit-identical to the Python index and the Rust reference); the C++
        # core only counts/stores the pre-split tokens.
        data = "\x01".join(_tokenize(text)).encode("utf-8")
        self._lib.bm25_add_tokens(
            self._h, self._slot_for(chunk_id, slot), data, len(data)
        )
        # chunks whose text tokenizes to nothing are not indexed natively;
        # mirror the Python behavior by dropping the id mapping again
        if not self._lib.bm25_contains(self._h, self._id_to_slot[chunk_id]):
            slot = self._id_to_slot.pop(chunk_id)
            self._slot_to_id.pop(slot, None)

    def remove_chunk(self, chunk_id: str) -> None:
        slot = self._id_to_slot.pop(chunk_id, None)
        if slot is not None:
            self._slot_to_id.pop(slot, None)
            self._lib.bm25_remove_chunk(self._h, slot)

    def contains(self, chunk_id: str) -> bool:
        slot = self._id_to_slot.get(chunk_id)
        return slot is not None and bool(self._lib.bm25_contains(self._h, slot))

    def score(self, query: str, limit: int) -> List[Tuple[str, float]]:
        if limit <= 0:
            limit = self.total_docs
        if limit <= 0:
            return []
        data = "\x01".join(_tokenize(query)).encode("utf-8")
        out_slots = np.zeros(limit, dtype=np.int64)
        out_scores = np.zeros(limit, dtype=np.float32)
        n = self._lib.bm25_score_tokens(
            self._h,
            data,
            len(data),
            limit,
            out_slots.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return [
            (self._slot_to_id[int(out_slots[i])], float(out_scores[i]))
            for i in range(int(n))
            if int(out_slots[i]) in self._slot_to_id
        ]

    def score_slots_into(self, query: str, limit: int, out_slots, out_vals) -> int:
        """Hot-path scoring: top-`limit` hits written straight into the
        caller's int32/f32 row buffers as ChunkStore slots — one ctypes
        call, zero per-hit Python objects. Valid only while slots_aligned
        (the native index then scores in store-slot space natively)."""
        if not self._slots_aligned:
            raise RuntimeError("index has chunks without registered slots")
        if limit <= 0 or self.total_docs == 0:
            return 0
        if len(self._scratch_slots) < limit:
            self._scratch_slots = np.zeros(limit, dtype=np.int64)
            self._scratch_vals = np.zeros(limit, dtype=np.float32)
        if query.isascii():
            # C-side tokenization: for pure-ASCII text the byte rules
            # (alnum runs >= 3 bytes, lowercased) are bit-identical to
            # ops/bm25.tokenize, and skipping the Python char loop saves
            # ~30 us/query on the serving hot path
            data = query.encode("ascii")
            score_fn = self._lib.bm25_score
        else:
            data = "\x01".join(_tokenize(query)).encode("utf-8")
            score_fn = self._lib.bm25_score_tokens
        n = int(
            score_fn(
                self._h,
                data,
                len(data),
                limit,
                self._scratch_slots.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_int64)
                ),
                self._scratch_vals.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_float)
                ),
            )
        )
        n = min(n, len(out_slots))
        out_slots[:n] = self._scratch_slots[:n]
        out_vals[:n] = self._scratch_vals[:n]
        return n

    def unseen_mass(self, query: str) -> float:
        """IDF-weighted unseen-term mass (see ops/bm25.LexicalIndex
        .unseen_mass — identical math, computed in C++): the share of the
        query's idf weight carried by terms with zero document frequency
        in the index. The joint rejection gate's out-of-domain signal."""
        data = "\x01".join(_tokenize(query)).encode("utf-8")
        return float(self._lib.bm25_unseen_mass(self._h, data, len(data)))

    def compile_all(self) -> int:
        """Build every term's read-optimized posting snapshot up front
        (index-load warmup). Without this, a query touching a term for
        the first time pays a lazy compile (copy + sort of the posting
        list — up to tens of ms for mid-frequency terms on 1M+ docs);
        after it, every query runs the contiguous fast path. Returns the
        number of terms compiled."""
        fn = getattr(self._lib, "bm25_compile_all", None)
        if fn is None:
            return 0
        return int(fn(self._h))

    def drop_stale(self, valid_ids: Set[str] | Iterable[str]) -> None:
        valid = set(valid_ids)
        slots = np.array(
            sorted(
                self._id_to_slot[c] for c in self._id_to_slot if c in valid
            ),
            dtype=np.int64,
        )
        self._lib.bm25_drop_stale(
            self._h,
            slots.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(slots),
        )
        for cid in [c for c in self._id_to_slot if c not in valid]:
            slot = self._id_to_slot.pop(cid)
            self._slot_to_id.pop(slot, None)

    def clear(self) -> None:
        self._lib.bm25_destroy(self._h)
        self._h = ctypes.c_void_p(self._lib.bm25_create())
        self._id_to_slot.clear()
        self._slot_to_id.clear()
        self._slots_aligned = True


def make_lexical_index(prefer_native: Optional[bool] = None):
    """Factory: native C++ index when available (or RAG_TPU_NATIVE_BM25=1
    forces/0 forbids), else the pure-Python index."""
    from rust_local_rag_tpu.ops.bm25 import LexicalIndex

    env = os.environ.get("RAG_TPU_NATIVE_BM25")
    if prefer_native is None:
        prefer_native = env != "0"
    if prefer_native and (native_available() or (env == "1" and build_native())):
        try:
            return NativeLexicalIndex()
        except RuntimeError:
            pass
    return LexicalIndex()
