"""Distributed contrastive training must actually improve retrieval:
train a tiny encoder on synthetic topic data over the 8-device mesh and
assert held-out top-1 retrieval accuracy rises well above the untrained
baseline (the capability the reference outsources to Ollama entirely)."""

import numpy as np
import jax
import jax.numpy as jnp

from rust_local_rag_tpu.models.encoder import (
    EncoderConfig,
    encoder_forward,
    init_encoder_params,
)
from rust_local_rag_tpu.models.tokenizer import HashTokenizer
from rust_local_rag_tpu.parallel.mesh import build_mesh
from rust_local_rag_tpu.parallel.train import (
    make_train_step,
    place_batch,
    shard_params,
)

CFG = EncoderConfig(
    vocab_size=512, dim=32, depth=2, heads=2, ffn_dim=64, max_len=16,
    activation_dtype="float32",
)
N_TOPICS = 8
WORDS_PER_TOPIC = 12
SEQ = 16


def _topic_vocab(rng):
    """Per topic: two DISJOINT word sets (query-side, doc-side). A query
    never shares a token with its matching documents, so untrained
    embeddings are at chance and only a learned cross-token association
    can solve the task."""
    words = [f"w{i}" for i in range(N_TOPICS * WORDS_PER_TOPIC * 2)]
    rng.shuffle(words)
    out = []
    for t in range(N_TOPICS):
        base = t * WORDS_PER_TOPIC * 2
        out.append(
            (
                words[base : base + WORDS_PER_TOPIC],                 # query side
                words[base + WORDS_PER_TOPIC : base + 2 * WORDS_PER_TOPIC],  # doc side
            )
        )
    return out


def _sample_text(rng, vocab):
    return " ".join(rng.choice(vocab, size=8))


def _encode(tok, texts):
    ids, mask = tok.encode_batch(texts, buckets=(SEQ,))
    return jnp.asarray(ids), jnp.asarray(mask)


def _top1_topic_accuracy(params, tok, rng, topics):
    """Held-out eval: does a query retrieve a doc from its own topic?"""
    docs, doc_topics = [], []
    for t, (_, dv) in enumerate(topics):
        for _ in range(4):
            docs.append(_sample_text(rng, dv))
            doc_topics.append(t)
    queries, q_topics = [], []
    for t, (qv, _) in enumerate(topics):
        for _ in range(4):
            queries.append(_sample_text(rng, qv))
            q_topics.append(t)

    d_ids, d_mask = _encode(tok, docs)
    q_ids, q_mask = _encode(tok, queries)
    d_emb = np.asarray(encoder_forward(params, d_ids, d_mask, CFG))
    q_emb = np.asarray(encoder_forward(params, q_ids, q_mask, CFG))
    sims = q_emb @ d_emb.T
    top1 = np.argmax(sims, axis=1)
    return float(
        np.mean([doc_topics[j] == q_topics[i] for i, j in enumerate(top1)])
    )


def test_contrastive_training_improves_retrieval():
    rng = np.random.default_rng(0)
    topics = _topic_vocab(rng)
    tok = HashTokenizer(vocab_size=CFG.vocab_size, max_len=SEQ)

    mesh = build_mesh((4, 2), ("data", "model"))
    params = shard_params(init_encoder_params(jax.random.PRNGKey(0), CFG), mesh, CFG)
    step = make_train_step(mesh, CFG, lr=3e-3)

    acc_before = _top1_topic_accuracy(jax.device_get(params), tok, np.random.default_rng(1), topics)

    B = 16
    for it in range(60):
        # (query, positive) pairs: two samples from the same topic
        ts = rng.integers(0, N_TOPICS, B)
        q_texts = [_sample_text(rng, topics[t][0]) for t in ts]
        p_texts = [_sample_text(rng, topics[t][1]) for t in ts]
        q_ids, q_mask = _encode(tok, q_texts)
        p_ids, p_mask = _encode(tok, p_texts)
        batch = place_batch((q_ids, q_mask, p_ids, p_mask), mesh)
        params, loss = step(params, *batch)

    acc_after = _top1_topic_accuracy(jax.device_get(params), tok, np.random.default_rng(1), topics)

    # untrained: ~chance (no token overlap between query/doc sides);
    # trained: the encoder has learned the cross-vocabulary association
    assert acc_before < 0.5, acc_before
    assert acc_after > acc_before + 0.3, (acc_before, acc_after)
    assert acc_after >= 0.8, (acc_before, acc_after)
