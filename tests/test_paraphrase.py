"""training/paraphrase.py: deterministic, register-preserving rewrites
that actually break lexical overlap (the training signal they exist for)."""

from __future__ import annotations

import numpy as np

from rust_local_rag_tpu.training.paraphrase import SYNONYMS, paraphrase


def test_deterministic_given_rng():
    q = "the function returns an array of integer values"
    a = paraphrase(q, np.random.default_rng(5))
    b = paraphrase(q, np.random.default_rng(5))
    assert a == b


def test_breaks_lexical_overlap():
    rng = np.random.default_rng(0)
    q = ("the function returns the maximum value of the array along the "
         "specified axis")
    rewrites = [paraphrase(q, rng) for _ in range(32)]
    src = set(q.lower().split())
    # on average a rewrite must replace/remove a meaningful share of the
    # source tokens (synonym_prob 0.85 over ~6 dictionary words here)
    overlaps = [
        len(set(r.lower().split()) & src) / len(src) for r in rewrites
    ]
    assert sum(overlaps) / len(overlaps) < 0.75
    assert len(set(rewrites)) > 8  # diverse, not one fixed rewrite


def test_never_empty_and_handles_unknown_words():
    rng = np.random.default_rng(1)
    for q in ("zzzqqq", "a of the", "x", ""):
        out = paraphrase(q, rng)
        assert isinstance(out, str) and out.strip() or q == ""


def test_synonym_table_is_sane():
    for k, alts in SYNONYMS.items():
        assert k == k.lower()
        assert alts and all(a and a == a.lower() for a in alts)
        assert k not in alts  # an identity synonym would be a no-op


def test_batcher_paraphrase_positive_keeps_full_passage():
    import os

    import pytest

    from rust_local_rag_tpu.models.tokenizer import HfTokenizer
    from rust_local_rag_tpu.models.reranker_service import (
        DEFAULT_PROMPT_TEMPLATE,
    )
    from rust_local_rag_tpu.training.train_reranker import PromptPairBatcher

    asset_tok = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "rust_local_rag_tpu", "assets", "tokenizer.json",
    )
    if not os.path.exists(asset_tok):
        pytest.skip("tokenizer asset not built")
    tok = HfTokenizer(asset_tok)
    paras = [
        "the function returns the maximum value of the array along the "
        "given axis and raises an error when the axis is invalid "
        "which callers must handle explicitly in their code " + str(i)
        for i in range(32)
    ]
    b = PromptPairBatcher(
        paras, tok, DEFAULT_PROMPT_TEMPLATE, seed=3,
        index_size=32, paraphrase_frac=1.0,
    )
    pi, pm, ni, nm = b.batch(8)
    assert pi.shape == ni.shape == (8, b.seq_len)
    # paraphrased positives exist and the batcher still emits valid pairs
    q, passage = b._query_and_passage(paras[0])
    assert passage == paras[0]  # full passage kept for paraphrased queries
