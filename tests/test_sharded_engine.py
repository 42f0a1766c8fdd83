"""Engine-level corpus sharding: RAG_TPU_SHARD_CORPUS=N must produce the
same rankings as the unsharded engine (the sharded merge is exact — see
parallel/sharded_search.sharded_hybrid_topk's containment argument)."""

import numpy as np
import pytest

from rust_local_rag_tpu.engine.chunk_store import ChunkMeta
from rust_local_rag_tpu.engine.rag_engine import RagEngine
from rust_local_rag_tpu.models import EmbeddingService, HashEncoder

N, D = 4096, 64


def _populate(eng, rng):
    bs = 1024
    for lo in range(0, N, bs):
        hi = lo + bs
        emb = rng.standard_normal((bs, D)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        metas = [
            ChunkMeta(
                id=f"c{i}", document_name=f"doc{i % 7}.pdf",
                text=f"synthetic chunk {i} alpha beta", chunk_index=i,
                page_number=1,
            )
            for i in range(lo, hi)
        ]
        eng.store.add_chunks(metas, emb)
        for m in metas[::37]:
            eng.lexical_index.add_chunk(m.id, m.text)


@pytest.fixture(scope="module")
def engines(tmp_path_factory):
    svc = EmbeddingService(HashEncoder(dim=D, model_name="shard-test"))
    plain = RagEngine(str(tmp_path_factory.mktemp("plain")), svc)
    _populate(plain, np.random.default_rng(7))

    import os

    os.environ["RAG_TPU_SHARD_CORPUS"] = "4"
    try:
        sharded = RagEngine(str(tmp_path_factory.mktemp("shard")), svc)
    finally:
        del os.environ["RAG_TPU_SHARD_CORPUS"]
    assert sharded._mesh is not None, "mesh not built (need >= 4 devices)"
    _populate(sharded, np.random.default_rng(7))
    return plain, sharded


def test_slab_is_row_sharded(engines):
    _, sharded = engines
    spec = sharded.store.corpus().sharding.spec
    assert spec[0] == "corpus"
    assert sharded.store.valid_mask().sharding.spec[0] == "corpus"


def test_sharded_search_matches_unsharded(engines):
    plain, sharded = engines
    for q in ("synthetic alpha beta", "chunk 100", "zeta unknown"):
        a = plain.search(q, 10)
        b = sharded.search(q, 10)
        assert [r.chunk_id for r in a] == [r.chunk_id for r in b]
        np.testing.assert_allclose(
            [r.score for r in a], [r.score for r in b], rtol=1e-5
        )
        np.testing.assert_allclose(
            [r.embedding_score for r in a],
            [r.embedding_score for r in b],
            rtol=1e-5,
        )


def test_sharded_batch_and_diversity(engines):
    plain, sharded = engines
    qs = [f"synthetic query {i} alpha" for i in range(4)]
    a = plain.search_with_diversity_batch(qs, 8, 0.4)
    b = sharded.search_with_diversity_batch(qs, 8, 0.4)
    for ra, rb in zip(a, b):
        assert [r.chunk_id for r in ra] == [r.chunk_id for r in rb]


def test_sharded_remove_document_stays_consistent(engines):
    _, sharded = engines
    before = sharded.search("synthetic alpha", 5)
    removed = sharded.store.remove_document("doc3.pdf")
    assert removed > 0
    after = sharded.search("synthetic alpha", 5)
    assert all(r.document != "doc3.pdf" for r in after)
    # mask update preserved the sharding
    assert sharded.store.valid_mask().sharding.spec[0] == "corpus"
    # restore is not needed; module fixture ends here
    assert before  # silence lint
