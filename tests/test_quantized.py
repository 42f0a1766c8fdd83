"""Int8 quantized corpus: recall quality of the two-phase int8+rescore path."""

import numpy as np
import jax.numpy as jnp

from rust_local_rag_tpu.ops.quantized import quantize_corpus, quantized_topk


def _unit(rng, n, d):
    m = rng.standard_normal((n, d)).astype(np.float32)
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def test_quantize_roundtrip_error_small(rng):
    c = _unit(rng, 100, 64)
    qc = quantize_corpus(jnp.asarray(c))
    deq = np.asarray(qc.values, dtype=np.float32) * np.asarray(qc.scales)
    assert np.abs(deq - c).max() < 1.0 / 127.0


def test_quantized_topk_high_recall(rng):
    q, n, d, k = 4, 8192, 64, 10
    queries = _unit(rng, q, d)
    corpus = _unit(rng, n, d)
    qc = quantize_corpus(jnp.asarray(corpus))
    v, i = quantized_topk(jnp.asarray(queries), qc, k, candidates=128)
    ref = queries @ corpus.T
    hits = 0
    for qi in range(q):
        want = set(np.argsort(-ref[qi])[:k].tolist())
        hits += len(want & set(np.asarray(i)[qi].tolist()))
    recall = hits / (q * k)
    assert recall >= 0.9, recall
    # rescored values are f32 dots against DEQUANTIZED rows (the original
    # f32 corpus is not stored in this mode) — within int8 error of truth
    deq = np.asarray(qc.values, dtype=np.float32) * np.asarray(qc.scales)
    for qi in range(q):
        got = np.asarray(v)[qi]
        idxs = np.asarray(i)[qi]
        np.testing.assert_allclose(
            got, (queries[qi] @ deq[idxs].T), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(got, ref[qi][idxs], atol=5e-3)


def test_quantized_values_sorted_desc(rng):
    q, n, d, k = 2, 2048, 32, 8
    qc = quantize_corpus(jnp.asarray(_unit(rng, n, d)))
    v, _ = quantized_topk(jnp.asarray(_unit(rng, q, d)), qc, k, candidates=64)
    v = np.asarray(v)
    assert (np.diff(v, axis=1) <= 1e-6).all()
