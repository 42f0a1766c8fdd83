"""Round-3 serving fast paths must be bit-identical to the lanes they
replace: packed single-fetch first stage, slot-aligned lexical scoring,
device-resident query embeddings, and head-only judge scoring at blend
weight 0 (the shipped gate config)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from rust_local_rag_tpu.ops.bm25 import LexicalIndex
from rust_local_rag_tpu.ops.hybrid import (
    hybrid_topk,
    hybrid_topk_packed,
    hybrid_topk_quantized,
    hybrid_topk_quantized_packed,
    unpack_topk,
)


def _inputs(nq=4, n=256, d=32, L=16, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    c = rng.standard_normal((n, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    mask = rng.random(n) > 0.1
    lex_slots = rng.integers(0, n, (nq, L)).astype(np.int32)
    lex_slots[:, -3:] = -1
    lex_vals = np.abs(rng.standard_normal((nq, L))).astype(np.float32)
    lex_vals[lex_slots < 0] = 0.0
    return q, c, mask, lex_slots, lex_vals


class TestPackedParity:
    def test_packed_matches_unpacked(self):
        q, c, mask, ls, lv = _inputs()
        args = (
            jnp.asarray(q), jnp.asarray(c), jnp.asarray(mask),
            jnp.asarray(ls), jnp.asarray(lv),
            jnp.float32(0.7), jnp.float32(0.3),
        )
        vals, emb, lex, idx = (np.asarray(x) for x in hybrid_topk(*args, 16))
        packed = hybrid_topk_packed(*args, 16)
        v2, e2, l2, i2 = unpack_topk(packed, q.shape[0], 16)
        np.testing.assert_array_equal(vals, v2)
        np.testing.assert_array_equal(emb, e2)
        np.testing.assert_array_equal(lex, l2)
        np.testing.assert_array_equal(idx, i2)

    def test_packed_quantized_matches(self):
        q, c, mask, ls, lv = _inputs(seed=1)
        absmax = np.maximum(np.abs(c).max(axis=1, keepdims=True), 1e-10)
        scales = (absmax / 127.0).astype(np.float32)
        values = np.clip(np.round(c / scales), -127, 127).astype(np.int8)
        l1 = (scales[:, 0] * np.abs(values).astype(np.float32).sum(axis=1))
        args = (
            jnp.asarray(q), jnp.asarray(values), jnp.asarray(scales),
            jnp.asarray(l1), jnp.asarray(mask), jnp.asarray(ls),
            jnp.asarray(lv), jnp.float32(0.7), jnp.float32(0.3),
        )
        vals, emb, lex, idx, exact = (
            np.asarray(x) for x in hybrid_topk_quantized(*args, 16)
        )
        packed = np.asarray(hybrid_topk_quantized_packed(*args, 16))
        v2, e2, l2, i2 = unpack_topk(packed, q.shape[0], 16)
        np.testing.assert_array_equal(vals, v2)
        np.testing.assert_array_equal(idx, i2)
        np.testing.assert_array_equal(emb, e2)
        np.testing.assert_array_equal(lex, l2)
        np.testing.assert_array_equal(exact, packed[:, 4, 0] > 0.5)

    def test_packed_carrier_is_int32(self):
        """The pack must ride an INTEGER array: f32 lanes holding bitcast
        int32 slot ids are corrupted by the axon TPU backend (denormal
        slot-id bit patterns flushed to zero, -1 sentinels canonicalized
        to qNaN), which made every served result render slot 0's chunk.
        Integer copies/concats are bit-exact on every backend."""
        q, c, mask, ls, lv = _inputs()
        args = (
            jnp.asarray(q), jnp.asarray(c), jnp.asarray(mask),
            jnp.asarray(ls), jnp.asarray(lv),
            jnp.float32(0.7), jnp.float32(0.3),
        )
        packed = np.asarray(hybrid_topk_packed(*args, 16))
        assert packed.dtype == np.int32

        absmax = np.maximum(np.abs(c).max(axis=1, keepdims=True), 1e-10)
        scales = (absmax / 127.0).astype(np.float32)
        values = np.clip(np.round(c / scales), -127, 127).astype(np.int8)
        l1 = scales[:, 0] * np.abs(values).astype(np.float32).sum(axis=1)
        qargs = (
            jnp.asarray(q), jnp.asarray(values), jnp.asarray(scales),
            jnp.asarray(l1), jnp.asarray(mask), jnp.asarray(ls),
            jnp.asarray(lv), jnp.float32(0.7), jnp.float32(0.3),
        )
        qpacked = np.asarray(hybrid_topk_quantized_packed(*qargs, 16))
        assert qpacked.dtype == np.int32

    def test_packed_sentinels_and_small_slots_survive(self):
        """Regression for the TPU slot-plane corruption: a mostly-masked
        slab (4 valid rows in a 1024-slot capacity, the live-server shape
        that failed) must round-trip small slot ids AND -1 tail sentinels
        through the packed fetch."""
        rng = np.random.default_rng(7)
        n, d, k = 1024, 32, 8
        c = np.zeros((n, d), np.float32)
        c[:4] = rng.standard_normal((4, d)).astype(np.float32)
        c[:4] /= np.linalg.norm(c[:4], axis=1, keepdims=True)
        q = rng.standard_normal((2, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        mask = np.zeros(n, bool)
        mask[:4] = True
        ls = np.full((2, 16), -1, np.int32)
        lv = np.zeros((2, 16), np.float32)
        args = (
            jnp.asarray(q), jnp.asarray(c), jnp.asarray(mask),
            jnp.asarray(ls), jnp.asarray(lv),
            jnp.float32(1.0), jnp.float32(0.0),
        )
        vals, emb, lex, idx = (np.asarray(x) for x in hybrid_topk(*args, k))
        v2, e2, l2, i2 = unpack_topk(hybrid_topk_packed(*args, k), 2, k)
        np.testing.assert_array_equal(idx, i2)
        assert set(i2[0, :4]) == {0, 1, 2, 3}
        np.testing.assert_array_equal(i2[:, 4:], -1)
        np.testing.assert_array_equal(vals, v2)

    def test_unpack_trims_padded_rows(self):
        q, c, mask, ls, lv = _inputs(nq=8)
        packed = hybrid_topk_packed(
            jnp.asarray(q), jnp.asarray(c), jnp.asarray(mask),
            jnp.asarray(ls), jnp.asarray(lv),
            jnp.float32(1.0), jnp.float32(0.0), 32,
        )
        v, e, l, i = unpack_topk(packed, 3, 10)
        assert v.shape == (3, 10) and i.shape == (3, 10)
        assert i.dtype == np.int32


class TestSlotAlignedLexical:
    def _indexes(self):
        texts = [
            "the quick brown fox jumps over the lazy dog",
            "pack my box with five dozen liquor jugs",
            "sphinx of black quartz judge my vow",
            "the five boxing wizards jump quickly",
        ]
        idx = LexicalIndex()
        for i, t in enumerate(texts):
            idx.add_chunk(f"c{i}", t, slot=i * 7)  # store slots 0,7,14,21
        return idx

    def test_score_slots_into_matches_score(self):
        idx = self._indexes()
        assert idx.slots_aligned
        out_s = np.full(8, -1, dtype=np.int32)
        out_v = np.zeros(8, dtype=np.float32)
        n = idx.score_slots_into("quick box judge", 8, out_s, out_v)
        pairs = idx.score("quick box judge", 8)
        assert n == len(pairs)
        for k, (cid, s) in enumerate(pairs):
            assert out_s[k] == int(cid[1:]) * 7
            assert out_v[k] == pytest.approx(s, rel=1e-6)

    def test_unaligned_add_disables_fast_path(self):
        idx = self._indexes()
        idx.add_chunk("c9", "unaligned text entry", slot=None)
        assert not idx.slots_aligned
        with pytest.raises(RuntimeError):
            idx.score_slots_into(
                "text", 4, np.zeros(4, np.int32), np.zeros(4, np.float32)
            )

    def test_native_slot_alignment(self):
        from rust_local_rag_tpu.ops.native_bm25 import (
            NativeLexicalIndex,
            native_available,
        )

        if not native_available():
            pytest.skip("native BM25 library not built")
        py = self._indexes()
        nat = NativeLexicalIndex()
        texts = [
            "the quick brown fox jumps over the lazy dog",
            "pack my box with five dozen liquor jugs",
            "sphinx of black quartz judge my vow",
            "the five boxing wizards jump quickly",
        ]
        for i, t in enumerate(texts):
            nat.add_chunk(f"c{i}", t, slot=i * 7)
        assert nat.slots_aligned
        s_n = np.full(8, -1, np.int32)
        v_n = np.zeros(8, np.float32)
        s_p = np.full(8, -1, np.int32)
        v_p = np.zeros(8, np.float32)
        nn = nat.score_slots_into("quick box judge", 8, s_n, v_n)
        np_ = py.score_slots_into("quick box judge", 8, s_p, v_p)
        assert nn == np_
        # same hit SET and scores (tie order may differ between impls)
        d_n = {int(s): float(v) for s, v in zip(s_n[:nn], v_n[:nn])}
        d_p = {int(s): float(v) for s, v in zip(s_p[:np_], v_p[:np_])}
        assert d_n.keys() == d_p.keys()
        for k in d_n:
            assert d_n[k] == pytest.approx(d_p[k], rel=1e-5)

    def test_native_slot_replacement(self):
        from rust_local_rag_tpu.ops.native_bm25 import (
            NativeLexicalIndex,
            native_available,
        )

        if not native_available():
            pytest.skip("native BM25 library not built")
        nat = NativeLexicalIndex()
        nat.add_chunk("a", "alpha bravo charlie", slot=3)
        # slot reuse after document replacement: old id must be evicted
        nat.add_chunk("b", "delta echo foxtrot", slot=3)
        assert not nat.contains("a")
        s = np.full(4, -1, np.int32)
        v = np.zeros(4, np.float32)
        n = nat.score_slots_into("alpha", 4, s, v)
        assert n == 0
        n = nat.score_slots_into("delta", 4, s, v)
        assert n == 1 and s[0] == 3


class TestEngineFastPathParity:
    """The engine's packed + slot-aligned route must return the same
    results as the legacy route (forced by breaking slot alignment)."""

    def _engine(self, tmpdir):
        from rust_local_rag_tpu.engine.chunk_store import ChunkMeta
        from rust_local_rag_tpu.engine.rag_engine import RagEngine
        from rust_local_rag_tpu.models.embedding_service import (
            EmbeddingService,
        )
        from rust_local_rag_tpu.models.fake_encoder import HashEncoder

        svc = EmbeddingService(HashEncoder(dim=64, model_name="fake"))
        eng = RagEngine(tmpdir, svc)
        rng = np.random.default_rng(7)
        emb = rng.standard_normal((40, 64)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        metas = [
            ChunkMeta(
                id=f"c{i}",
                document_name=f"d{i % 5}.pdf",
                text=f"passage {i} about topic {i % 11} and term{i}",
                chunk_index=i,
                page_number=1 + i % 3,
            )
            for i in range(40)
        ]
        slots = eng.store.add_chunks(metas, emb)
        for m, s in zip(metas, slots):
            eng.lexical_index.add_chunk(m.id, m.text, s)
        return eng

    def test_fast_equals_legacy(self, tmp_path):
        eng = self._engine(str(tmp_path))
        queries = ["topic 3 term7", "passage about term22", "nothing here"]
        fast = eng.search_batch(queries, 5)
        # break alignment -> legacy pack_sparse_lex route
        eng.lexical_index._slots_aligned = False
        legacy = eng.search_batch(queries, 5)
        assert len(fast) == len(legacy)
        for f_row, l_row in zip(fast, legacy):
            assert [r.chunk_id for r in f_row] == [r.chunk_id for r in l_row]
            for f, l in zip(f_row, l_row):
                assert f.score == pytest.approx(l.score, rel=1e-6)
                assert f.embedding_score == pytest.approx(
                    l.embedding_score, rel=1e-6
                )
                assert (f.lexical_score or 0.0) == pytest.approx(
                    l.lexical_score or 0.0, rel=1e-6
                )

    def test_head_only_gate_matches_full_pool(self, tmp_path):
        """With reranker weight 0.0 (judge-as-filter config), scoring only
        the emitted head must give the same output as scoring the whole
        initial_k pool."""
        from rust_local_rag_tpu.config import QueryWeights
        from rust_local_rag_tpu.models.reranker import FakeReranker
        from rust_local_rag_tpu.models.reranker_service import RerankerService

        eng = self._engine(str(tmp_path))
        eng.reranker = RerankerService(FakeReranker())
        w0 = QueryWeights(reranker=0.0, initial=1.0)
        head = eng.search_batch(["topic 3 term7", "passage about term22"], 4, w0)
        # force the full-pool route by pretending a positive blend weight
        # at need_rows computation time: emulate legacy by monkeypatching
        # ResolvedWeights via a tiny positive weight is NOT equivalent, so
        # instead compare against rerank-off ordering + gate semantics:
        # weight-0 blend preserves initial ordering, so chunk order must
        # match the rerank-off result while carrying judge scores.
        off = eng.search_batch(
            ["topic 3 term7", "passage about term22"], 4, use_reranker=False
        )
        for h_row, o_row in zip(head, off):
            assert [r.chunk_id for r in h_row] == [r.chunk_id for r in o_row]
            assert all(r.reranker_score is not None for r in h_row)


class TestDeviceQueryEmbeddings:
    def test_device_encode_matches_host(self):
        from rust_local_rag_tpu.models.encoder import (
            EncoderConfig,
            TransformerEncoderModel,
        )

        cfg = EncoderConfig(
            dim=32, depth=1, heads=2, ffn_dim=64,
            vocab_size=512, max_len=32, out_dim=48,
        )
        m = TransformerEncoderModel(cfg=cfg, weights_path="/nonexistent")
        texts = ["hello world", "second query about things", "third"]
        host = m.encode_queries(texts)
        dev = np.asarray(m.encode_queries_device(texts))
        assert dev.shape[0] >= len(texts)
        np.testing.assert_allclose(dev[: len(texts)], host, rtol=1e-5)
        # unit-normalized on device
        np.testing.assert_allclose(
            np.linalg.norm(dev, axis=1), 1.0, atol=1e-4
        )
