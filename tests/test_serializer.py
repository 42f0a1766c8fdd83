"""Native response serializer must emit byte-parseable JSON identical in
content to the object path (SearchResult.to_dict), including gate
filtering, invalid-slot skipping, slot-reuse re-registration, and unicode
escaping."""

from __future__ import annotations

import json

import numpy as np
import pytest

from rust_local_rag_tpu.engine.chunk_store import ChunkMeta, ChunkStore
from rust_local_rag_tpu.server.serializer import (
    ResponseSerializer,
    native_serializer_available,
)

pytestmark = pytest.mark.skipif(
    not native_serializer_available(), reason="native serializer not built"
)


def _store(n=6):
    store = ChunkStore(dim=8)
    metas = [
        ChunkMeta(
            id=f"c{i}",
            document_name=f"doc {i % 2} «ünïcode».pdf",
            text=f'passage {i} with "quotes", backslash \\ and emoji 🎯',
            chunk_index=i,
            page_number=i + 1,
            section="intro" if i % 2 else None,
        )
        for i in range(n)
    ]
    emb = np.random.default_rng(0).standard_normal((n, 8)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    store.add_chunks(metas, emb)
    return store


def test_serialize_matches_object_path():
    store = _store()
    ser = ResponseSerializer(lambda: store)
    slots = np.array([0, 3, 5], dtype=np.int32)
    score = np.array([0.91, 0.52, 0.11], dtype=np.float32)
    emb = np.array([0.8, 0.4, 0.1], dtype=np.float32)
    lex = np.array([0.3, 0.0, 1.0], dtype=np.float32)
    body = ser.serialize_query(slots, score, emb, lex)
    parsed = json.loads(body)
    assert list(parsed) == ["results"]
    rows = parsed["results"]
    assert len(rows) == 3
    for row, slot, s, e, l in zip(rows, slots, score, emb, lex):
        m = store.meta_for_slot(int(slot))
        assert row["text"] == m.text
        assert row["document"] == m.document_name
        assert row["chunk_id"] == m.id
        assert row["chunk_index"] == m.chunk_index
        assert row["page_number"] == m.page_number
        assert row["section"] == m.section
        assert row["score"] == pytest.approx(float(s), rel=1e-6)
        assert row["embedding_score"] == pytest.approx(float(e), rel=1e-6)
        assert row["lexical_score"] == pytest.approx(float(l), rel=1e-6)
        assert row["initial_score"] == row["score"]


def test_gate_floor_and_invalid_rows():
    store = _store()
    ser = ResponseSerializer(lambda: store)
    slots = np.array([0, -1, 2, 4], dtype=np.int32)
    score = np.array([0.9, 0.8, float("-inf"), 0.5], dtype=np.float32)
    emb = np.array([0.9, 0.8, 0.7, 0.01], dtype=np.float32)
    lex = np.zeros(4, dtype=np.float32)
    # -1 slot and -inf score always skipped; floor drops emb < 0.05
    rows = json.loads(ser.serialize_query(slots, score, emb, lex, floor=0.05))
    assert [r["chunk_id"] for r in rows["results"]] == ["c0"]
    rows = json.loads(ser.serialize_query(slots, score, emb, lex))
    assert [r["chunk_id"] for r in rows["results"]] == ["c0", "c4"]


def test_slot_reuse_reregisters():
    store = _store(3)
    ser = ResponseSerializer(lambda: store)
    one = np.array([1], dtype=np.int32)
    f1 = np.ones(1, dtype=np.float32)
    first = json.loads(ser.serialize_query(one, f1, f1, f1))
    assert first["results"][0]["chunk_id"] == "c1"
    # replace the document occupying slot 1
    store.remove_ids(["c1"])
    store.add_chunks(
        [ChunkMeta(id="r9", document_name="new.pdf", text="fresh text",
                   chunk_index=0, page_number=7)],
        np.ones((1, 8), dtype=np.float32) / np.sqrt(8),
    )
    assert store.slot_for_id("r9") == 1
    again = json.loads(ser.serialize_query(one, f1, f1, f1))
    assert again["results"][0]["chunk_id"] == "r9"
    assert again["results"][0]["text"] == "fresh text"


def test_empty_and_buffer_growth():
    store = ChunkStore(dim=4)
    big_text = "x" * (3 << 20)  # bigger than the 1 MB initial buffer
    store.add_chunks(
        [ChunkMeta(id="big", document_name="b.pdf", text=big_text,
                   chunk_index=0, page_number=1)],
        np.ones((1, 4), dtype=np.float32) / 2.0,
    )
    ser = ResponseSerializer(lambda: store)
    empty = json.loads(
        ser.serialize_query(
            np.array([], dtype=np.int32), np.array([], dtype=np.float32),
            np.array([], dtype=np.float32), np.array([], dtype=np.float32),
        )
    )
    assert empty == {"results": []}
    one = np.array([0], dtype=np.int32)
    f1 = np.ones(1, dtype=np.float32)
    out = json.loads(ser.serialize_query(one, f1, f1, f1))
    assert out["results"][0]["text"] == big_text
