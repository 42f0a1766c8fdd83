"""HBM-resident chunk store: a slab of embeddings plus host-side metadata.

The reference keeps chunks in a HashMap<String, DocumentChunk> with the
embedding inside each entry (rag_engine.rs:104-113). Mutable hash maps do not
exist on a TPU; instead the store is a slab design (SURVEY.md §7 "Mutable
index vs. immutable device arrays"):

  * device: a preallocated [capacity, D] embedding matrix and a [capacity]
    validity mask, both jax Arrays. Appends are dynamic-update-slices; a
    document replacement frees its slots (mask clear + free list) and new
    chunks refill holes. Capacity doubles on demand.
  * host: per-slot metadata (chunk id, document, text, page, section, chunk
    metadata) plus an id -> slot map. Embeddings live ONLY on device; the
    rare host consumers (persistence snapshots, compaction) read the slab
    back with one device_get instead of keeping a duplicate mirror (which
    would cost another 30 GB of host RAM at 10M x 768 f32).

Search ops read `corpus()` / `valid_mask()` directly from HBM — no
per-candidate host access ever happens on the query path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp


@dataclass
class ChunkMeta:
    """Host-side chunk record (device holds only the embedding row).

    Field names mirror the reference's DocumentChunk (rag_engine.rs:46-59)
    minus `embedding`, which lives in the slab.
    """

    id: str
    document_name: str
    text: str
    chunk_index: int
    page_number: int = 0
    section: Optional[str] = None
    metadata: dict = field(default_factory=dict)


class ChunkStore:
    def __init__(
        self,
        dim: int,
        dtype=jnp.float32,
        initial_capacity: int = 1024,
        quantized: bool = False,
        mesh=None,
        corpus_axis: str = "corpus",
    ):
        """quantized=True stores per-row symmetric int8 values + f32 scales
        (half the HBM of bf16 / quarter of f32 — the full 10M x 768 target
        corpus fits ONE v5e chip; see ops/quantized.py for the two-phase
        search that keeps final ordering in f32).

        mesh: optional jax.sharding.Mesh — the slab and mask are placed
        ROW-SHARDED over `corpus_axis` (multi-chip corpora beyond one HBM;
        searched with parallel/sharded_search.sharded_hybrid_topk). Slab
        updates (.at[].set / concatenate-grow) preserve the sharding via
        GSPMD propagation; compaction re-places explicitly.
        """
        self.dim = int(dim)
        self.quantized = bool(quantized)
        self.dtype = jnp.int8 if quantized else dtype
        self.mesh = mesh
        self._row_sharding = None
        self._mask_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # corpus_axis may be a tuple of mesh axes (hierarchical
            # slice x ici sharding) — PartitionSpec accepts a multi-axis
            # element for one dimension
            axes = (
                corpus_axis
                if isinstance(corpus_axis, tuple)
                else (corpus_axis,)
            )
            cspec = axes if len(axes) > 1 else axes[0]
            self._row_sharding = NamedSharding(mesh, P(cspec, None))
            self._mask_sharding = NamedSharding(mesh, P(cspec))
            n_shards = 1
            for a in axes:
                n_shards *= mesh.shape[a]
            while initial_capacity % n_shards:
                initial_capacity += 1
        self._capacity = int(initial_capacity)
        self._emb = self._place_rows(
            jnp.zeros((self._capacity, self.dim), dtype=self.dtype)
        )
        self._scales = (
            self._place_rows(
                jnp.zeros((self._capacity, 1), dtype=jnp.float32)
            )
            if quantized
            else None
        )
        # per-row dequantized L1 norm scale_i * sum_j |v_i8[j]| — the
        # sound bound on how far a query's int8-quantization error can move
        # row i's score; powers the exactness certificate in
        # ops/hybrid.hybrid_topk_quantized
        self._l1 = (
            self._place_mask(
                jnp.zeros((self._capacity,), dtype=jnp.float32)
            )
            if quantized
            else None
        )
        self._mask = self._place_mask(
            jnp.zeros((self._capacity,), dtype=bool)
        )
        self._meta: List[Optional[ChunkMeta]] = [None] * self._capacity
        self._id_to_slot: Dict[str, int] = {}
        self._free: List[int] = []
        self._high_water = 0  # slots [0, high_water) may be valid
        # bumped on every add/remove/compact: consumers caching per-slot
        # derived state (e.g. the native response-fragment registry) use
        # it to skip revalidation while the store is unchanged
        self.mutations = 0

    def _place_rows(self, arr: jax.Array) -> jax.Array:
        if self._row_sharding is not None:
            return jax.device_put(arr, self._row_sharding)
        return arr

    def _place_mask(self, arr: jax.Array) -> jax.Array:
        if self._mask_sharding is not None:
            return jax.device_put(arr, self._mask_sharding)
        return arr

    # ----- introspection -------------------------------------------------

    def __len__(self) -> int:
        return len(self._id_to_slot)

    @property
    def capacity(self) -> int:
        return self._capacity

    @property
    def high_water(self) -> int:
        return self._high_water

    def corpus(self) -> jax.Array:
        """[capacity, D] device matrix (rows beyond the mask are garbage)."""
        return self._emb

    def scales(self) -> jax.Array:
        """[capacity, 1] per-row dequantization scales (quantized mode)."""
        if self._scales is None:
            raise RuntimeError("store is not quantized")
        return self._scales

    def l1(self) -> jax.Array:
        """[capacity] per-row dequantized L1 norms (quantized mode):
        scale_i * ||v_i8||_1, the exactness-certificate error bound."""
        if self._l1 is None:
            raise RuntimeError("store is not quantized")
        return self._l1

    def quantized_corpus(self):
        """QuantizedCorpus view for ops/quantized.py."""
        from rust_local_rag_tpu.ops.quantized import QuantizedCorpus

        return QuantizedCorpus(values=self._emb, scales=self.scales())

    def valid_mask(self) -> jax.Array:
        """[capacity] device bool mask of live slots."""
        return self._mask

    def meta_for_slot(self, slot: int) -> ChunkMeta:
        m = self._meta[slot]
        if m is None:
            raise KeyError(f"slot {slot} is empty")
        return m

    def slot_for_id(self, chunk_id: str) -> int:
        return self._id_to_slot[chunk_id]

    def contains(self, chunk_id: str) -> bool:
        return chunk_id in self._id_to_slot

    def chunk_ids(self) -> List[str]:
        return list(self._id_to_slot.keys())

    def iter_meta(self):
        for slot in self._id_to_slot.values():
            yield slot, self._meta[slot]

    def document_names(self) -> List[str]:
        """Sorted unique document names (rag_engine.rs:850-859)."""
        return sorted({m.document_name for _, m in self.iter_meta()})

    def embedding_for_slot(self, slot: int) -> np.ndarray:
        return np.asarray(self._emb[slot], dtype=np.float32)

    # ----- mutation -------------------------------------------------------

    def _grow(self, min_capacity: int) -> None:
        new_cap = self._capacity
        while new_cap < min_capacity:
            new_cap *= 2
        if new_cap == self._capacity:
            return
        pad = new_cap - self._capacity
        self._emb = jnp.concatenate(
            [self._emb, jnp.zeros((pad, self.dim), dtype=self.dtype)], axis=0
        )
        if self._scales is not None:
            self._scales = jnp.concatenate(
                [self._scales, jnp.zeros((pad, 1), dtype=jnp.float32)], axis=0
            )
        if self._l1 is not None:
            self._l1 = jnp.concatenate(
                [self._l1, jnp.zeros((pad,), dtype=jnp.float32)], axis=0
            )
        self._mask = jnp.concatenate(
            [self._mask, jnp.zeros((pad,), dtype=bool)], axis=0
        )
        self._meta.extend([None] * pad)
        self._capacity = new_cap

    def _alloc_slots(self, n: int) -> List[int]:
        slots: List[int] = []
        while self._free and len(slots) < n:
            slots.append(self._free.pop())
        remaining = n - len(slots)
        if remaining:
            if self._high_water + remaining > self._capacity:
                self._grow(self._high_water + remaining)
            slots.extend(range(self._high_water, self._high_water + remaining))
            self._high_water += remaining
        return slots

    def add_chunks(
        self, metas: Sequence[ChunkMeta], embeddings: np.ndarray
    ) -> List[int]:
        """Insert chunks (embeddings already unit-normalized). Returns slots."""
        if len(metas) != embeddings.shape[0]:
            raise ValueError("metas/embeddings length mismatch")
        if not metas:
            return []
        if embeddings.shape[1] != self.dim:
            raise ValueError(
                f"embedding dim {embeddings.shape[1]} != store dim {self.dim}"
            )
        for m in metas:
            if m.id in self._id_to_slot:
                raise ValueError(f"duplicate chunk id {m.id}")

        slots = self._alloc_slots(len(metas))
        emb32 = np.asarray(embeddings, dtype=np.float32)
        for slot, meta in zip(slots, metas):
            self._meta[slot] = meta
            self._id_to_slot[meta.id] = slot

        slot_idx = jnp.asarray(np.asarray(slots, dtype=np.int32))
        if self.quantized:
            absmax = np.maximum(np.abs(emb32).max(axis=1, keepdims=True), 1e-10)
            scale = (absmax / 127.0).astype(np.float32)
            q = np.clip(np.round(emb32 / scale), -127, 127).astype(np.int8)
            self._emb = self._emb.at[slot_idx].set(jnp.asarray(q))
            self._scales = self._scales.at[slot_idx].set(jnp.asarray(scale))
            l1 = (
                scale[:, 0]
                * np.abs(q).astype(np.float32).sum(axis=1)
            ).astype(np.float32)
            self._l1 = self._l1.at[slot_idx].set(jnp.asarray(l1))
        else:
            self._emb = self._emb.at[slot_idx].set(
                jnp.asarray(emb32, dtype=self.dtype)
            )
        self._mask = self._mask.at[slot_idx].set(True)
        self.mutations += 1
        return slots

    def remove_document(self, document_name: str) -> int:
        """Free every chunk of a document (reference's retain(..) at
        rag_engine.rs:347-348). Returns number of chunks removed."""
        doomed = [
            slot
            for slot, meta in list(self.iter_meta())
            if meta.document_name == document_name
        ]
        return self._remove_slots(doomed)

    def remove_ids(self, chunk_ids: Sequence[str]) -> int:
        doomed = [self._id_to_slot[c] for c in chunk_ids if c in self._id_to_slot]
        return self._remove_slots(doomed)

    def _remove_slots(self, slots: List[int]) -> int:
        if not slots:
            return 0
        for slot in slots:
            meta = self._meta[slot]
            if meta is not None:
                del self._id_to_slot[meta.id]
            self._meta[slot] = None
            self._free.append(slot)
        slot_idx = jnp.asarray(np.asarray(slots, dtype=np.int32))
        self._mask = self._mask.at[slot_idx].set(False)
        self.mutations += 1
        return len(slots)

    def compact(self) -> None:
        """Repack live slots to the front (periodic maintenance); the
        permutation happens on device (one gather)."""
        live = sorted(self._id_to_slot.values())
        n = len(live)
        new_meta: List[Optional[ChunkMeta]] = [None] * self._capacity
        id_to_slot: Dict[str, int] = {}
        for new_slot, old_slot in enumerate(live):
            meta = self._meta[old_slot]
            new_meta[new_slot] = meta
            id_to_slot[meta.id] = new_slot
        self._meta = new_meta
        self._id_to_slot = id_to_slot
        self._free = []
        self._high_water = n
        perm = np.zeros(self._capacity, dtype=np.int32)
        perm[:n] = np.asarray(live, dtype=np.int32)
        # gathers drop the sharding annotation — re-place afterwards
        self._emb = self._place_rows(
            jnp.take(self._emb, jnp.asarray(perm), axis=0).at[n:].set(0)
        )
        if self._scales is not None:
            self._scales = self._place_rows(
                jnp.take(self._scales, jnp.asarray(perm), axis=0)
                .at[n:]
                .set(0)
            )
        if self._l1 is not None:
            self._l1 = self._place_mask(
                jnp.take(self._l1, jnp.asarray(perm), axis=0).at[n:].set(0)
            )
        mask = np.zeros((self._capacity,), dtype=bool)
        mask[:n] = True
        self._mask = self._place_mask(jnp.asarray(mask))
        self.mutations += 1

    # ----- persistence helpers -------------------------------------------

    def snapshot_host(self):
        """(embeddings [n, D] f32, metas) for live chunks, slot-ordered.

        Compile-free by design: fetches the RAW slab buffer (one device->
        host copy of an existing array, no XLA program) and gathers the
        live rows on the host. The previous on-device ``jnp.take(live)``
        compiled a fresh gather program for every distinct live-row count,
        and through the axon TPU tunnel a fresh compile+first-fetch has a
        minutes-long tail (the same 1-row gather measured 2.7 s / 31 s /
        80 s / 200 s / >15 min across runs) — which stalled ingest
        persistence mid-reindex. The slab is at most 2x the live payload
        (capacity doubles on grow), so the raw copy is within 2x of the
        optimal transfer and fully deterministic."""
        live = sorted(self._id_to_slot.values())
        if not live:
            return np.zeros((0, self.dim), np.float32), []
        slab = np.asarray(self._emb)  # raw D2H copy, no compile
        emb = slab[live].astype(np.float32)
        if self.quantized:
            scales = np.asarray(self._scales)[live]
            emb = emb * scales  # dequantize for persistence (f32 format)
        metas = [self._meta[s] for s in live]
        return emb, metas
