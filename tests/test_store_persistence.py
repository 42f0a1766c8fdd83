"""ChunkStore slab behavior + model-partitioned persistence contract
(rag_engine.rs:1427-1714)."""

import json
import os

import numpy as np
import pytest

from rust_local_rag_tpu.engine.chunk_store import ChunkStore, ChunkMeta
from rust_local_rag_tpu.engine import persistence as P


def _meta(i, doc="doc.pdf"):
    return ChunkMeta(
        id=f"chunk-{i}", document_name=doc, text=f"text {i}", chunk_index=i,
        page_number=i + 1, section=None, metadata={"token_count": 5},
    )


def _emb(n, d=8, seed=0):
    rng = np.random.default_rng(seed)
    e = rng.standard_normal((n, d)).astype(np.float32)
    return e / np.linalg.norm(e, axis=1, keepdims=True)


# ----- ChunkStore -----

def test_store_add_and_lookup():
    s = ChunkStore(dim=8, initial_capacity=4)
    slots = s.add_chunks([_meta(0), _meta(1)], _emb(2))
    assert len(s) == 2
    assert s.contains("chunk-0")
    assert s.meta_for_slot(slots[0]).id == "chunk-0"
    assert np.asarray(s.valid_mask()).sum() == 2


def test_store_growth():
    s = ChunkStore(dim=8, initial_capacity=2)
    s.add_chunks([_meta(i) for i in range(5)], _emb(5))
    assert s.capacity >= 5
    assert len(s) == 5
    mask = np.asarray(s.valid_mask())
    assert mask.sum() == 5


def test_store_remove_document_frees_and_refills():
    s = ChunkStore(dim=8, initial_capacity=8)
    s.add_chunks([_meta(i, "a.pdf") for i in range(3)], _emb(3))
    s.add_chunks([_meta(i + 10, "b.pdf") for i in range(2)], _emb(2, seed=1))
    removed = s.remove_document("a.pdf")
    assert removed == 3
    assert len(s) == 2
    assert s.document_names() == ["b.pdf"]
    # holes are reused before growing
    hw_before = s.high_water
    s.add_chunks([_meta(i + 20, "c.pdf") for i in range(3)], _emb(3, seed=2))
    assert s.high_water == hw_before
    assert len(s) == 5


def test_store_duplicate_id_rejected():
    s = ChunkStore(dim=8)
    s.add_chunks([_meta(0)], _emb(1))
    with pytest.raises(ValueError):
        s.add_chunks([_meta(0)], _emb(1))


def test_store_dim_mismatch_rejected():
    s = ChunkStore(dim=8)
    with pytest.raises(ValueError):
        s.add_chunks([_meta(0)], _emb(1, d=16))


def test_store_compact():
    s = ChunkStore(dim=8, initial_capacity=8)
    s.add_chunks([_meta(i, "a.pdf") for i in range(4)], _emb(4))
    s.remove_document("a.pdf")
    s.add_chunks([_meta(9, "b.pdf")], _emb(1, seed=3))
    s.compact()
    assert s.high_water == 1
    assert len(s) == 1
    emb, metas = s.snapshot_host()
    assert emb.shape == (1, 8)
    assert metas[0].id == "chunk-9"
    mask = np.asarray(s.valid_mask())
    assert mask[0] and not mask[1:].any()


def test_store_device_host_mirror_consistent():
    s = ChunkStore(dim=8)
    e = _emb(3)
    s.add_chunks([_meta(i) for i in range(3)], e)
    dev = np.asarray(s.corpus())[:3]
    np.testing.assert_allclose(dev, e, rtol=1e-6)


# ----- sanitize_model_name (rag_engine.rs:1435-1461 + TDD tests :2365-2457) -----

@pytest.mark.parametrize("raw,expected", [
    ("nomic-embed-text", "nomic-embed-text"),
    ("model/with/slashes", "model_with_slashes"),
    ("model:with:colons", "model_with_colons"),
    ("../../etc/passwd", ".._.._etc_passwd"),
    ("", "default"),
    ("   ", "default"),
    ("___", "default"),
    ("...", "default"),
    ("model name with spaces", "model_name_with_spaces"),
    ("UPPER.case-ok_123", "UPPER.case-ok_123"),
])
def test_sanitize_model_name(raw, expected):
    assert P.sanitize_model_name(raw) == expected


def test_index_path_uses_sanitized_name(tmp_path):
    p = P.get_index_path(str(tmp_path), "a/b:c")
    assert p == os.path.join(str(tmp_path), "chunks_a_b_c.npz")


# ----- save / load roundtrip -----

def _state(model="m1", n=4, needs_reindex=False, hashes=None):
    metas = [_meta(i) for i in range(n)]
    return P.IndexState(
        model=model,
        embeddings=_emb(n),
        metas=metas,
        needs_reindex=needs_reindex,
        document_hashes=hashes if hashes is not None else {"doc.pdf": "abc123"},
    )


def test_roundtrip_npz(tmp_path):
    st = _state()
    path = P.save_index(str(tmp_path), st)
    assert os.path.exists(path)
    res = P.load_index(str(tmp_path), "m1")
    assert res.state is not None
    assert res.state.model == "m1"
    assert len(res.state.metas) == 4
    np.testing.assert_allclose(res.state.embeddings, st.embeddings, rtol=1e-6)
    assert res.state.document_hashes == {"doc.pdf": "abc123"}
    assert not res.needs_reindex


def test_atomic_write_no_tmp_left(tmp_path):
    P.save_index(str(tmp_path), _state())
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]


def test_corrupt_npz_preserved_and_reindex(tmp_path):
    path = P.get_index_path(str(tmp_path), "m1")
    with open(path, "wb") as f:
        f.write(b"garbage not an npz")
    res = P.load_index(str(tmp_path), "m1")
    assert res.state is None
    assert res.needs_reindex
    assert os.path.exists(path)  # never deleted


def test_load_missing_starts_fresh(tmp_path):
    res = P.load_index(str(tmp_path), "m1")
    assert res.state is None
    assert not res.needs_reindex


def test_migration_from_reference_json(tmp_path):
    # Build a reference-format v2 JSON index by hand
    emb = _emb(2)
    blob = {
        "version": 2,
        "model": "m1",
        "chunks": {
            "id-0": {
                "id": "id-0", "document_name": "a.pdf", "text": "hello world",
                "embedding": [float(x) for x in emb[0]],
                "chunk_index": 0, "page_number": 3, "section": "Intro",
                "metadata": {"page_range": [3, 3], "sentence_range": [0, 1],
                             "section_title": "Intro", "token_count": 7,
                             "overlap_with_previous": 0},
            },
            "id-1": {
                "id": "id-1", "document_name": "a.pdf", "text": "more text",
                "embedding": [float(x) for x in (emb[1] * 3.0)],  # unnormalized
                "chunk_index": 1, "page_number": 4, "section": None,
                "metadata": {},
            },
        },
        "needs_reindex": False,
        "document_hashes": {"a.pdf": "deadbeef"},
    }
    with open(P.get_reference_json_path(str(tmp_path), "m1"), "w") as f:
        json.dump(blob, f)

    res = P.load_index(str(tmp_path), "m1")
    assert res.state is not None
    assert res.migrated
    assert {m.id for m in res.state.metas} == {"id-0", "id-1"}
    # embeddings re-normalized on load (rag_engine.rs:1678-1680)
    norms = np.linalg.norm(res.state.embeddings, axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    # migration wrote the packed file; JSON preserved
    assert os.path.exists(P.get_index_path(str(tmp_path), "m1"))
    assert os.path.exists(P.get_reference_json_path(str(tmp_path), "m1"))


def test_version_1_forces_reindex(tmp_path):
    blob = {"version": 1, "model": "m1", "chunks": {}, "needs_reindex": False}
    with open(P.get_reference_json_path(str(tmp_path), "m1"), "w") as f:
        json.dump(blob, f)
    res = P.load_index(str(tmp_path), "m1")
    assert res.state is None
    assert res.needs_reindex


def test_legacy_chunks_json_model_match_migrates(tmp_path):
    emb = _emb(1)
    blob = {
        "version": 2, "model": "m1",
        "chunks": {"id-0": {"id": "id-0", "document_name": "a.pdf",
                            "text": "t", "embedding": [float(x) for x in emb[0]],
                            "chunk_index": 0, "page_number": 1,
                            "section": None, "metadata": {}}},
        "needs_reindex": False, "document_hashes": {"a.pdf": "x"},
    }
    with open(P.get_legacy_path(str(tmp_path)), "w") as f:
        json.dump(blob, f)
    res = P.load_index(str(tmp_path), "m1")
    assert res.state is not None and res.migrated
    # legacy file preserved (rag_engine.rs:1699-1705)
    assert os.path.exists(P.get_legacy_path(str(tmp_path)))


def test_legacy_other_model_preserved_fresh_start(tmp_path):
    blob = {"version": 2, "model": "OTHER", "chunks": {}, "needs_reindex": False}
    with open(P.get_legacy_path(str(tmp_path)), "w") as f:
        json.dump(blob, f)
    res = P.load_index(str(tmp_path), "m1")
    assert res.state is None
    assert not res.needs_reindex
    assert os.path.exists(P.get_legacy_path(str(tmp_path)))


def test_legacy_no_model_field_forces_reindex(tmp_path):
    # very old format: raw chunk map without model info
    blob = {"id-0": {"id": "id-0", "text": "t", "embedding": [0.1]}}
    with open(P.get_legacy_path(str(tmp_path)), "w") as f:
        json.dump(blob, f)
    res = P.load_index(str(tmp_path), "m1")
    assert res.state is None
    assert res.needs_reindex


def test_missing_hashes_forces_reindex(tmp_path):
    st = _state(hashes={})
    P.save_index(str(tmp_path), st)
    res = P.load_index(str(tmp_path), "m1")
    assert res.state is not None
    assert res.state.needs_reindex  # fingerprints missing with chunks present


def test_two_models_coexist(tmp_path):
    P.save_index(str(tmp_path), _state(model="nomic-768", n=2))
    P.save_index(str(tmp_path), _state(model="mxbai-1024", n=3))
    r1 = P.load_index(str(tmp_path), "nomic-768")
    r2 = P.load_index(str(tmp_path), "mxbai-1024")
    assert len(r1.state.metas) == 2
    assert len(r2.state.metas) == 3


def test_export_reference_json_roundtrip(tmp_path):
    st = _state(model="m1", n=2)
    P.export_reference_json(str(tmp_path), st)
    # our own loader can read the exported reference format back
    os.unlink(P.get_index_path(str(tmp_path), "m1")) if os.path.exists(
        P.get_index_path(str(tmp_path), "m1")) else None
    res = P.load_index(str(tmp_path), "m1")
    assert res.state is not None
    assert len(res.state.metas) == 2


# ----- dual-dim hot-swap (rag_engine.rs:1586-1645, SURVEY §7) -----

def test_engine_dual_dim_hot_swap(tmp_path):
    """Two encoders with DIFFERENT dims (768-d contract scaled down: 64-d
    and 24-d hash encoders) coexist on disk; switch_embedding_model swaps
    between them in-process without destroying either index, and searches
    return each model's own chunks after every swap."""
    import pdfgen
    from rust_local_rag_tpu.engine import RagEngine
    from rust_local_rag_tpu.models import EmbeddingService, HashEncoder

    svc_a = EmbeddingService(HashEncoder(dim=64, model_name="model-a-64"))
    svc_b = EmbeddingService(HashEncoder(dim=24, model_name="model-b-24"))
    eng = RagEngine(str(tmp_path), svc_a, reranker=None)
    eng.add_document(
        "alpha.pdf",
        pdfgen.make_pdf(["Tomato plants need regular deep watering."]),
    )
    assert len(eng.store) > 0
    n_a = len(eng.store)

    # swap to B: empty index, fresh start; ingest a different doc
    eng.switch_embedding_model(svc_b)
    assert eng.embedding_model() == "model-b-24"
    assert len(eng.store) == 0
    assert eng.store.dim == 24
    eng.add_document(
        "beta.pdf",
        pdfgen.make_pdf(["Gradient descent minimizes the loss function."]),
    )
    n_b = len(eng.store)
    assert n_b > 0

    # both index files exist on disk, neither clobbered
    assert os.path.exists(P.get_index_path(str(tmp_path), "model-a-64"))
    assert os.path.exists(P.get_index_path(str(tmp_path), "model-b-24"))

    # swap back to A: the original chunks are intact and searchable
    eng.switch_embedding_model(svc_a)
    assert len(eng.store) == n_a
    assert eng.store.dim == 64
    res = eng.search("tomato watering", top_k=1)
    assert res and res[0].document == "alpha.pdf"

    # and B again: still intact
    eng.switch_embedding_model(svc_b)
    assert len(eng.store) == n_b
    res = eng.search("gradient descent", top_k=1)
    assert res and res[0].document == "beta.pdf"

    # same-model swap is a no-op
    eng.switch_embedding_model(svc_b)
    assert len(eng.store) == n_b
