"""Native C++ BM25 index: parity with the pure-Python LexicalIndex."""

import numpy as np
import pytest

from rust_local_rag_tpu.ops.bm25 import LexicalIndex
from rust_local_rag_tpu.ops import native_bm25

pytestmark = pytest.mark.skipif(
    not (native_bm25.native_available() or native_bm25.build_native()),
    reason="native library unavailable and could not be built",
)


def _both():
    return LexicalIndex(), native_bm25.NativeLexicalIndex()


DOCS = {
    "c0": "alpha beta gamma alpha",
    "c1": "beta delta epsilon words here",
    "c2": "gamma gamma unique tokens appear",
    "c3": "alpha appears once more in this longer chunk of text",
    "c4": "completely different vocabulary set entirely",
    "c5": "numbers 12345 and 999 count too",
}


def test_score_parity_on_ascii_corpus():
    py, nat = _both()
    for cid, text in DOCS.items():
        py.add_chunk(cid, text)
        nat.add_chunk(cid, text)
    for query in ("alpha gamma", "beta", "numbers 999", "vocabulary set",
                  "unique appear tokens", "absent term"):
        p = py.score(query, 10)
        n = nat.score(query, 10)
        assert {c for c, _ in p} == {c for c, _ in n}, query
        pd, nd = dict(p), dict(n)
        for cid in pd:
            assert nd[cid] == pytest.approx(pd[cid], rel=1e-5), (query, cid)


def test_remove_and_contains_parity():
    py, nat = _both()
    for cid, text in DOCS.items():
        py.add_chunk(cid, text)
        nat.add_chunk(cid, text)
    py.remove_chunk("c0")
    nat.remove_chunk("c0")
    assert not nat.contains("c0")
    assert nat.contains("c1")
    p = py.score("alpha", 10)
    n = nat.score("alpha", 10)
    assert {c for c, _ in p} == {c for c, _ in n}


def test_re_add_replaces():
    _, nat = _both()
    nat.add_chunk("c1", "alpha alpha alpha")
    nat.add_chunk("c1", "beta")
    assert nat.score("alpha", 10) == []
    assert [c for c, _ in nat.score("beta", 10)] == ["c1"]
    assert nat.total_docs == 1


def test_drop_stale():
    _, nat = _both()
    nat.add_chunk("keep", "alpha beta gamma")
    nat.add_chunk("stale", "delta epsilon zeta")
    nat.drop_stale({"keep"})
    assert nat.contains("keep")
    assert not nat.contains("stale")
    assert nat.total_docs == 1


def test_empty_token_chunk_not_indexed():
    _, nat = _both()
    nat.add_chunk("tiny", "a b")  # all tokens < 3 chars
    assert not nat.contains("tiny")
    assert nat.total_docs == 0


def test_factory_prefers_native(monkeypatch):
    monkeypatch.setenv("RAG_TPU_NATIVE_BM25", "1")
    idx = native_bm25.make_lexical_index()
    assert isinstance(idx, native_bm25.NativeLexicalIndex)
    monkeypatch.setenv("RAG_TPU_NATIVE_BM25", "0")
    idx2 = native_bm25.make_lexical_index()
    assert isinstance(idx2, LexicalIndex)


def test_large_corpus_speed_sanity():
    """Native must handle a few thousand chunks briskly (smoke, not a benchmark)."""
    import time

    nat = native_bm25.NativeLexicalIndex()
    rng = np.random.default_rng(0)
    vocab = [f"word{i}" for i in range(2000)]
    t0 = time.monotonic()
    for i in range(2000):
        words = rng.choice(vocab, 60)
        nat.add_chunk(f"c{i}", " ".join(words))
    add_s = time.monotonic() - t0
    t0 = time.monotonic()
    for _ in range(50):
        nat.score("word10 word999 word1500", 25)
    score_s = time.monotonic() - t0
    assert add_s < 10.0
    assert score_s < 5.0


def test_score_parity_on_unicode_corpus():
    """Tokenization is done host-side with Unicode rules and shipped
    pre-split to C++ (ADVICE r1: the old byte-level native tokenizer
    diverged from the Python/Rust semantics on non-ASCII text)."""
    docs = {
        "u0": "Müller straße café résumé",        # lowercase umlauts kept
        "u1": "MÜLLER shouting CAFÉ text",        # Unicode lowercasing
        "u2": "日本語のテキストです 形態素",          # CJK runs
        "u3": "mixed ascii and café terms",
        "u4": "ña ñañ añaño words",               # ñ sequences, length rules
    }
    py, nat = _both()
    for cid, text in docs.items():
        py.add_chunk(cid, text)
        nat.add_chunk(cid, text)
    for q in ["müller", "CAFÉ résumé", "日本語のテキストです", "añaño", "café"]:
        ps = dict(py.score(q, 10))
        ns = dict(nat.score(q, 10))
        assert set(ps) == set(ns), (q, ps, ns)
        for cid in ps:
            assert abs(ps[cid] - ns[cid]) < 1e-5, (q, cid, ps[cid], ns[cid])


def test_unicode_casefold_contains_parity():
    py, nat = _both()
    py.add_chunk("x", "ΣΊΣΥΦΟΣ greek UPPER")
    nat.add_chunk("x", "ΣΊΣΥΦΟΣ greek UPPER")
    ps = dict(py.score("σίσυφος", 5))
    ns = dict(nat.score("σίσυφος", 5))
    assert set(ps) == set(ns)


def test_unseen_mass_parity():
    """bm25_unseen_mass (C++) matches LexicalIndex.unseen_mass bit-close
    on seen/unseen/mixed/unicode/empty queries."""
    py, nat = _both()
    for i, (cid, text) in enumerate(DOCS.items()):
        py.add_chunk(cid, text)
        nat.add_chunk(cid, text, slot=i)
    queries = [
        "alpha beta",
        "zebra xylophone quasar",
        "alpha zebra",
        "beta delta unique vocabulary",
        "numbers 12345 zebra",
        "",
        "ab",  # filtered to nothing
        "Münchën naïve alpha",  # multibyte path
    ]
    for q in queries:
        assert py.unseen_mass(q) == pytest.approx(
            nat.unseen_mass(q), abs=1e-6
        ), q


def test_unseen_mass_tracks_mutation():
    """df lookups follow add/remove: indexing a term drops it from the
    unseen set, removing its only chunk restores it."""
    py, nat = _both()
    nat.add_chunk("c0", "alpha beta", slot=0)
    assert nat.unseen_mass("zebra") == 1.0
    nat.add_chunk("c1", "zebra stripes", slot=1)
    assert nat.unseen_mass("zebra") == 0.0
    nat.remove_chunk("c1")
    assert nat.unseen_mass("zebra") == 1.0
    del py
