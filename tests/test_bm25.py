"""LexicalIndex BM25 parity with the reference semantics (rag_engine.rs:2083-2247)."""

import math

import pytest

from rust_local_rag_tpu.ops.bm25 import LexicalIndex, tokenize


def test_tokenize_rules():
    assert tokenize("The quick-brown fox! ab abc") == ["the", "quick", "brown", "fox", "abc"]
    assert tokenize("a b c") == []           # all < 3 chars dropped
    assert tokenize("123 4567") == ["123", "4567"]  # numerics kept
    assert tokenize("") == []
    assert tokenize("MixedCASE Token") == ["mixedcase", "token"]


def test_add_and_score_single_term():
    idx = LexicalIndex()
    idx.add_chunk("c1", "alpha beta gamma")
    idx.add_chunk("c2", "alpha alpha delta")
    idx.add_chunk("c3", "epsilon zeta eta")
    idx.add_chunk("c4", "theta iota kappa")
    idx.add_chunk("c5", "lambda muu nuu")

    results = idx.score("alpha", limit=10)
    ids = [r[0] for r in results]
    assert set(ids) == {"c1", "c2"}
    # c2 has tf=2 -> higher BM25
    assert ids[0] == "c2"

    # hand-check BM25 for c1: N=5, df=2, tf=1, dl=3, avgdl=3
    idf = max(math.log((5 - 2 + 0.5) / (2 + 0.5)), 0.0)
    want_c1 = idf * (1 * 2.5) / (1 + 1.5 * (1 - 0.75 + 0.75 * 1.0))
    got_c1 = dict(results)["c1"]
    assert got_c1 == pytest.approx(want_c1, abs=1e-9)


def test_idf_clamped_nonnegative():
    idx = LexicalIndex()
    # term in every doc -> idf would be negative -> clamped to 0 -> no hits
    for i in range(4):
        idx.add_chunk(f"c{i}", "common filler words")
    results = idx.score("common", limit=10)
    assert all(score == 0.0 for _, score in results) or results == []


def test_remove_chunk_updates_stats():
    idx = LexicalIndex()
    idx.add_chunk("c1", "alpha beta")
    idx.add_chunk("c2", "alpha gamma")
    idx.remove_chunk("c1")
    assert idx.total_docs == 1
    assert not idx.contains("c1")
    assert idx.contains("c2")
    results = idx.score("alpha", limit=10)
    assert [r[0] for r in results] == ["c2"]


def test_re_add_replaces():
    idx = LexicalIndex()
    idx.add_chunk("c1", "alpha alpha alpha")
    idx.add_chunk("c1", "beta")
    assert idx.total_docs == 1
    assert idx.score("alpha", 10) == []
    assert [r[0] for r in idx.score("beta", 10)] == ["c1"]


def test_drop_stale():
    idx = LexicalIndex()
    idx.add_chunk("keep", "alpha beta")
    idx.add_chunk("stale", "gamma delta")
    idx.drop_stale({"keep"})
    assert idx.contains("keep")
    assert not idx.contains("stale")
    assert idx.total_docs == 1


def test_empty_query_and_empty_index():
    idx = LexicalIndex()
    assert idx.score("anything", 10) == []
    idx.add_chunk("c1", "alpha beta")
    assert idx.score("a b", 10) == []  # all tokens filtered


def test_limit_truncation():
    idx = LexicalIndex()
    for i in range(10):
        idx.add_chunk(f"c{i}", f"shared term{i} unique{i} shared2")
    results = idx.score("shared term3", limit=3)
    assert len(results) <= 3
    # the doc containing term3 must rank first
    assert results[0][0] == "c3"


def test_unseen_mass_basics():
    """IDF-weighted unseen-term mass: 0 on empty/fully-seen queries, 1 on
    fully-novel queries, monotone in-between; duplicates count once."""
    idx = LexicalIndex()
    assert idx.unseen_mass("anything at all") == 0.0  # empty index
    idx.add_chunk("c1", "alpha beta gamma retrieval engine")
    idx.add_chunk("c2", "alpha delta gamma serving stack")
    idx.add_chunk("c3", "alpha rankings over indexed corpora")
    assert idx.unseen_mass("alpha gamma") == 0.0
    assert idx.unseen_mass("zebra xylophone") == 1.0
    # the unseen term carries the MAX idf, so it dominates a common term:
    # "alpha" appears in every doc (df=3 of 3 -> idf clamps to 0), leaving
    # ALL the weight on the unseen term
    assert idx.unseen_mass("alpha zebra") == 1.0
    part = idx.unseen_mass("beta zebra")  # beta df=1 of 3: positive idf
    assert 0.0 < part < 1.0
    # duplicates of an unseen term do not inflate the mass
    assert idx.unseen_mass("beta zebra zebra zebra") == part
    # sub-3-char tokens are filtered like the scorer's tokenize
    assert idx.unseen_mass("a b") == 0.0
