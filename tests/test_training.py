"""Training subsystem: corpus harvesting, pair construction, checkpoint
metadata round-trip, and the committed tokenizer asset."""

import os

import numpy as np
import jax
import pytest

from rust_local_rag_tpu.models.checkpoint import save_params
from rust_local_rag_tpu.models.encoder import (
    EncoderConfig,
    TransformerEncoderModel,
    init_encoder_params,
    load_encoder_checkpoint,
)
from rust_local_rag_tpu.training import corpus as tc

ASSET_TOK = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "rust_local_rag_tpu",
    "assets",
    "tokenizer.json",
)

needs_tokenizer = pytest.mark.skipif(
    not os.path.exists(ASSET_TOK), reason="tokenizer asset not built"
)


# ----- corpus harvesting -----

def test_paragraphs_from_text_strips_markup_and_code():
    text = (
        "Compute the arithmetic mean along the specified axis.\n"
        "Returns the :func:`average` of the array elements as ``ndarray``.\n"
        "\n"
        ">>> np.mean([1, 2, 3])\n"
        "2.0\n"
        "\n"
        ".. note:: something\n"
        "Second paragraph about broadcasting rules across dimensions here.\n"
    )
    paras = tc.paragraphs_from_text(text)
    # doctest '>>>'/'...' lines are dropped; stray output ("2.0") survives
    # here but is rejected downstream by the prose filter
    assert "average" in paras[0] and ":func:" not in paras[0]
    assert "``" not in paras[0]
    assert not any(">>>" in p for p in paras)
    assert paras[-1].startswith("Second paragraph")
    assert not tc._looks_like_prose("2.0")
    assert tc._looks_like_prose(paras[0])


def test_harvest_is_deterministic_and_excludes():
    a = tc.harvest(packages=("chex",), max_paragraphs=50)
    b = tc.harvest(packages=("chex",), max_paragraphs=50)
    assert a == b and len(a) > 0
    # excluding the first paragraph's hash removes exactly it
    ex = {tc.normalized_hash(a[0])}
    c = tc.harvest(packages=("chex",), exclude_hashes=ex, max_paragraphs=50)
    assert a[0] not in c and a[1] in c


def test_normalized_hash_is_whitespace_case_insensitive():
    h1 = tc.normalized_hash("Gradient  Descent converges\nslowly")
    h2 = tc.normalized_hash("gradient descent CONVERGES slowly")
    assert h1 == h2


# ----- pair batching -----

@needs_tokenizer
def test_pair_batcher_shapes_and_specials():
    from rust_local_rag_tpu.models.tokenizer import HfTokenizer
    from rust_local_rag_tpu.training.pairs import PairBatcher

    pars = [
        "The gradient of the loss with respect to the parameters is "
        "computed by reverse-mode automatic differentiation over the "
        "traced computation graph, then averaged across the batch axis "
        "before the optimizer update is applied to every weight tensor.",
    ] * 8
    b = PairBatcher(pars, HfTokenizer(ASSET_TOK), seq_len=32, seed=0)
    q_ids, q_mask, p_ids, p_mask = b.batch(4)
    assert q_ids.shape == (4, 32) and p_mask.shape == (4, 32)
    # every row starts with [CLS] and the masked region ends with [SEP]
    for i in range(4):
        n = int(q_mask[i].sum())
        assert q_ids[i, 0] == b.cls_id
        assert q_ids[i, n - 1] == b.sep_id
        assert (q_ids[i, n:] == b.pad_id).all()
    # positives differ from queries (independent crops) at least sometimes
    assert (q_ids != p_ids).any()


@needs_tokenizer
def test_pair_batcher_stacked_and_bank():
    from rust_local_rag_tpu.models.tokenizer import HfTokenizer
    from rust_local_rag_tpu.training.pairs import PairBatcher

    pars = [
        f"Topic {i}: the scheduler assigns work to each replica and "
        "collects partial results into a single ordered output stream "
        "which downstream consumers read with bounded memory usage."
        for i in range(16)
    ]
    b = PairBatcher(pars, HfTokenizer(ASSET_TOK), seq_len=32, seed=1)
    qi, qm, pi, pm = b.stacked_batches(3, 4)
    assert qi.shape == (3, 4, 32)
    bank = b.eval_bank(8)
    assert bank[0].shape[0] == 8


# ----- checkpoint metadata / out_proj -----

def test_checkpoint_metadata_roundtrip(tmp_path):
    cfg = EncoderConfig(
        vocab_size=64, dim=16, depth=1, heads=2, ffn_dim=32, max_len=16,
        activation_dtype="float32", out_dim=24,
    )
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    assert "out_proj" in params and params["out_proj"].shape == (16, 24)
    path = str(tmp_path / "e.safetensors")
    save_params(params, path, metadata={"encoder_config": cfg.to_json()}, half=True)
    loaded, meta_cfg = load_encoder_checkpoint(path)
    assert meta_cfg == cfg
    # f16 storage widens back to f32
    assert loaded["embed"].dtype == np.float32
    np.testing.assert_allclose(
        np.asarray(loaded["embed"]),
        np.asarray(params["embed"]),
        atol=1e-3,
    )


def test_model_uses_embedded_config(tmp_path):
    cfg = EncoderConfig(
        vocab_size=64, dim=16, depth=1, heads=2, ffn_dim=32, max_len=16,
        activation_dtype="float32", out_dim=24,
    )
    params = init_encoder_params(jax.random.PRNGKey(1), cfg)
    path = str(tmp_path / "e.safetensors")
    save_params(params, path, metadata={"encoder_config": cfg.to_json()})
    m = TransformerEncoderModel(weights_path=path)
    assert m.cfg == cfg
    assert m.dim == 24  # service dim is the OUTPUT dim
    out = m.encode(["hello world"])
    assert out.shape == (1, 24)
    np.testing.assert_allclose((out ** 2).sum(axis=1), 1.0, rtol=1e-5)


# ----- tokenizer asset -----

@needs_tokenizer
def test_tokenizer_asset_contract():
    from rust_local_rag_tpu.models.tokenizer import HfTokenizer

    t = HfTokenizer(ASSET_TOK)
    # yes/no must be single content tokens (reranker decision ids)
    cls_sep = {t.tokenize("")[0], t.tokenize("")[-1]}
    for w in ("yes", "no"):
        content = [i for i in t.tokenize(w) if i not in cls_sep]
        assert len(content) == 1, (w, content)
    # zero UNK on plain technical English
    unk = t._tok.token_to_id("[UNK]")
    ids = t.tokenize(
        "Sparse matrices reduce memory usage when most entries are zero."
    )
    assert unk not in ids


@needs_tokenizer
def test_prefixed_checkpoint_routes_queries_and_docs(tmp_path):
    """A checkpoint trained with dual task prefixes makes encode() and
    encode_queries() produce different embeddings for the same text, and
    the EmbeddingService routes query paths through encode_queries."""
    from rust_local_rag_tpu.models.embedding_service import EmbeddingService
    from rust_local_rag_tpu.models.tokenizer import HfTokenizer

    cfg = EncoderConfig(
        vocab_size=HfTokenizer(ASSET_TOK).vocab_size, dim=16, depth=1,
        heads=2, ffn_dim=32, max_len=64, activation_dtype="float32",
        out_dim=16,
    )
    params = init_encoder_params(jax.random.PRNGKey(3), cfg)
    path = str(tmp_path / "pref.safetensors")
    save_params(
        params, path,
        metadata={
            "encoder_config": cfg.to_json(),
            "query_prefix": "search_query: ",
            "document_prefix": "search_document: ",
        },
    )
    m = TransformerEncoderModel(weights_path=path, tokenizer_path=ASSET_TOK)
    d = m.encode(["the gradient accumulates"])
    q = m.encode_queries(["the gradient accumulates"])
    assert not np.allclose(d, q)
    svc = EmbeddingService(m)
    qq = svc.get_query_embeddings(["the gradient accumulates"])
    np.testing.assert_allclose(qq[0], q[0], rtol=1e-5)
    dd = svc.embed_texts(["the gradient accumulates"])
    np.testing.assert_allclose(dd[0], d[0], rtol=1e-5)


@needs_tokenizer
def test_mixed_batcher_prefixes():
    from rust_local_rag_tpu.models.tokenizer import HfTokenizer
    from rust_local_rag_tpu.training.pairs import PairBatcher

    pars = [
        "The scheduler assigns work to replicas and collects ordered "
        "partial results into one output stream that consumers read with "
        "bounded memory and no cross-worker coordination at all."
    ] * 8
    b = PairBatcher(
        pars, HfTokenizer(ASSET_TOK), seed=0,
        query_prefix="search_query: ", doc_prefix="search_document: ",
    )
    q_ids, q_mask, p_ids, p_mask = b.mixed_batch(6, p_len=64)
    assert q_ids.shape == (6, 32) and p_ids.shape == (6, 64)
    # every query row begins [CLS] + query-prefix ids
    for i in range(6):
        assert q_ids[i, 0] == b.cls_id
        np.testing.assert_array_equal(
            q_ids[i, 1 : 1 + len(b.q_prefix)], b.q_prefix
        )
        np.testing.assert_array_equal(
            p_ids[i, 1 : 1 + len(b.d_prefix)], b.d_prefix
        )


@needs_tokenizer
def test_reranker_checkpoint_config_roundtrip(tmp_path):
    from rust_local_rag_tpu.models.reranker import (
        RerankerConfig,
        TransformerReranker,
        init_reranker_params,
    )

    cfg = RerankerConfig(
        vocab_size=8193, dim=16, depth=1, heads=2, ffn_dim=32, max_len=64,
        activation_dtype="float32",
    )
    params = init_reranker_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "rr.safetensors")
    save_params(params, path, metadata={"reranker_config": cfg.to_json()})
    rr = TransformerReranker(weights_path=path, tokenizer_path=ASSET_TOK)
    assert rr.cfg == cfg
    out = rr.score_prompts(["Query: a\nChunk:\nb\nAnswer:"])
    assert len(out) == 1 and 0.0 <= out[0][0] <= 1.0


@needs_tokenizer
def test_reranker_prompt_pair_batcher():
    from rust_local_rag_tpu.models.reranker_service import (
        DEFAULT_PROMPT_TEMPLATE,
    )
    from rust_local_rag_tpu.models.tokenizer import HfTokenizer
    from rust_local_rag_tpu.training.train_reranker import PromptPairBatcher

    pars = [
        f"Paragraph {i}: exceptional vocabulary item qqzzword{i} appears "
        "here with enough surrounding words to pass the minimum length "
        "filter for prompt pair construction in training."
        for i in range(20)
    ]
    b = PromptPairBatcher(
        pars, HfTokenizer(ASSET_TOK), DEFAULT_PROMPT_TEMPLATE,
        seq_len=128, seed=0, index_size=20,
    )
    pi, pm, ni, nm = b.batch(8)
    assert pi.shape == (8, 128) and ni.shape == (8, 128)
    assert pm.sum() > 0 and nm.sum() > 0
    # positive and negative prompts differ (different chunk text)
    assert (pi != ni).any()


@needs_tokenizer
def test_hard_negative_batcher_and_loss_step():
    """mixed_hn_batch mines BM25 neighbors (keyword traps) and the
    hard-negative InfoNCE step runs and reduces loss on a tiny model."""
    import optax
    from jax.sharding import Mesh

    from rust_local_rag_tpu.models.tokenizer import HfTokenizer
    from rust_local_rag_tpu.parallel.train import (
        make_optax_scan_step_hn,
        shard_params,
    )
    from rust_local_rag_tpu.training.pairs import PairBatcher

    pars = [
        f"Distinct topic {i}: the quorum protocol qqword{i} elects a "
        "leader replica and replicates the ordered log to follower nodes "
        "with bounded staleness under partial network partitions."
        for i in range(24)
    ]
    b = PairBatcher(pars, HfTokenizer(ASSET_TOK), seed=0)
    b.premine_hard_negatives(index_size=24, n_neighbors=2, threads=2)
    assert b.neighbors is not None and b.neighbors.shape == (len(b.docs), 2)
    # mined neighbors never point at the source doc itself
    for i in range(len(b.docs)):
        assert i not in set(b.neighbors[i][b.neighbors[i] >= 0].tolist())

    qi, qm, pi, pm, ni, nm = b.mixed_hn_batch(4, p_len=64)
    assert qi.shape == (4, 32) and pi.shape == (4, 64) and ni.shape == (4, 64)
    assert nm.sum() > 0 and (pi != ni).any()

    cfg = EncoderConfig(
        vocab_size=HfTokenizer(ASSET_TOK).vocab_size,
        dim=32, depth=1, heads=2, ffn_dim=64, max_len=64,
        activation_dtype="float32", out_dim=32,
    )
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    devices = jax.devices()
    mesh = Mesh(np.array(devices).reshape(len(devices), 1), ("data", "model"))
    params = shard_params(params, mesh, cfg)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = make_optax_scan_step_hn(mesh, cfg, tx)
    batch = b.mixed_hn_stacked_batches(2, 8, p_len=64)
    params, opt_state, loss0 = step(params, opt_state, *batch)
    for _ in range(6):
        batch = b.mixed_hn_stacked_batches(2, 8, p_len=64)
        params, opt_state, loss = step(params, opt_state, *batch)
    assert float(loss) < float(loss0)


# ----- dense-negative mining (encoder v5 recipe) -----

def test_canonical_crops_deterministic_and_bounded():
    from rust_local_rag_tpu.training.mining import canonical_crops

    texts = [
        " ".join(f"w{i}_{j}" for j in range(30)) for i in range(20)
    ] + ["short one"]
    a = canonical_crops(texts, seed=5)
    b = canonical_crops(texts, seed=5)
    assert a == b, "crops must be deterministic for cache keying"
    for t, c in zip(texts, a):
        assert c and c in t
        assert 1 <= len(c.split()) <= 12


@needs_tokenizer
def test_negative_index_draws_from_dense_table_with_fallback():
    import numpy as np

    from rust_local_rag_tpu.models.tokenizer import HfTokenizer
    from rust_local_rag_tpu.training.pairs import PairBatcher

    pars = [
        f"Doc {i}: the storage layer compacts immutable runs of sorted "
        "records in the background so point lookups touch a bounded "
        "number of files while sequential ingestion stays append-only."
        for i in range(8)
    ]
    b = PairBatcher(pars, HfTokenizer(ASSET_TOK), seq_len=32, seed=3)
    D = len(b.docs)
    # BM25 table: every doc's neighbor is doc 1; dense: doc 2, but doc 0's
    # dense row was fully denoised away (-1) so it must fall back
    b.neighbors = np.full((D, 2), -1, dtype=np.int32)
    b.neighbors[:, 0] = 1
    b.dense_neighbors = np.full((D, 2), -1, dtype=np.int32)
    b.dense_neighbors[1:, 0] = 2
    draws0 = {b._negative_index(0) for _ in range(40)}
    assert draws0 == {1}, "empty dense row must fall back to the BM25 row"
    draws3 = {b._negative_index(3) for _ in range(60)}
    assert draws3 == {1, 2}, "both tables must be sampled"
    # self-reference is never returned even if mined
    b.dense_neighbors[2, 0] = 2
    b.neighbors[2, 0] = 2
    assert 2 not in {b._negative_index(2) for _ in range(40)}


def test_denoise_with_reranker_drops_high_margin(monkeypatch):
    import numpy as np

    from rust_local_rag_tpu.training import mining

    texts = [f"paragraph {i} about topic {i % 3}" for i in range(6)]
    table = np.array(
        [[1, 2], [0, -1], [3, 4], [-1, -1], [5, 0], [1, -1]],
        dtype=np.int32,
    )

    class Judge:
        def score_prompts(self, prompts):
            # margin = +2 (false negative) whenever the PASSAGE (the text
            # after "Chunk:" in the serving template) mentions topic 0
            out = []
            for p in prompts:
                chunk = p.split("Chunk:\n")[1].split("\n\nJudge")[0]
                yes = "topic 0" in chunk
                out.append((0.9, 1.0, -1.0) if yes else (0.1, -1.0, 1.0))
            return out

    import rust_local_rag_tpu.models.encoder as enc
    import rust_local_rag_tpu.models.reranker as rr

    monkeypatch.setattr(rr, "TransformerReranker", lambda: Judge())
    monkeypatch.setattr(
        enc, "default_asset", lambda name: f"/fake/{name}"
    )
    out, stats = mining.denoise_with_reranker(texts, table, margin=0.0)
    valid = table >= 0
    assert stats["pairs"] == int(valid.sum())
    # entries pointing at paragraphs 0 or 3 (topic 0) were dropped
    for i in range(table.shape[0]):
        for k in range(table.shape[1]):
            j = table[i, k]
            if j < 0:
                assert out[i, k] == -1
            elif int(j) in (0, 3):
                assert out[i, k] == -1, (i, k, j)
            else:
                assert out[i, k] == j
    assert stats["dropped"] == sum(
        1 for row in table for j in row if int(j) in (0, 3)
    )


def test_cached_denoised_table_roundtrip(monkeypatch, tmp_path):
    """cached_denoised_table mines+denoises once, then serves the SAME
    table (and stats) from disk without touching either model again."""
    import numpy as np

    import rust_local_rag_tpu.models.encoder as enc
    from rust_local_rag_tpu.training import mining

    texts = [f"paragraph number {i} with enough words" for i in range(4)]
    mined = np.array([[1], [2], [3], [0]], dtype=np.int32)
    calls = {"mine": 0, "judge": 0}

    def fake_mine(ts, n_neighbors=4):
        calls["mine"] += 1
        assert ts == texts
        return mined.copy()

    def fake_denoise(ts, table, margin=0.0):
        calls["judge"] += 1
        out = table.copy()
        out[0, 0] = -1  # one judged false negative
        return out, {"pairs": 4, "dropped": 1}

    monkeypatch.setenv("HOME", str(tmp_path))
    monkeypatch.setattr(mining, "mine_dense_neighbors", fake_mine)
    monkeypatch.setattr(mining, "denoise_with_reranker", fake_denoise)
    monkeypatch.setattr(enc, "default_asset", lambda name: None)

    t1, s1 = mining.cached_denoised_table(texts, n_neighbors=1)
    t2, s2 = mining.cached_denoised_table(texts, n_neighbors=1)
    assert calls == {"mine": 1, "judge": 1}  # second call was a cache hit
    assert np.array_equal(t1, t2)
    assert t1[0, 0] == -1 and t1[1, 0] == 2
    assert s1["dropped"] == s2["dropped"] == 1
    # different margin = different key = fresh mine
    mining.cached_denoised_table(texts, n_neighbors=1, margin=0.5)
    assert calls["mine"] == 2


def test_ood_junk_queries_deterministic_and_disjoint():
    from eval_harness.corpus_data import REJECTION_QUERIES
    from eval_harness.heldout_data import HELDOUT_REJECTION_QUERIES
    from rust_local_rag_tpu.training.ood import junk_queries

    a = junk_queries(300, seed=3)
    b = junk_queries(300, seed=3)
    assert a == b
    assert len(set(a)) > 50  # real variety, not one template
    # the synthesized pool must not contain (or lexically anchor on) any
    # eval rejection query from either split — rejection success is never
    # memorization
    eval_rejections = set(REJECTION_QUERIES) | set(HELDOUT_REJECTION_QUERIES)
    assert not set(a) & eval_rejections
    banned = {"westphalia", "octopus", "betelgeuse", "amazon",
              "magic flute", "ethanol", "fifa", "green tea", "tasmania",
              "eiffel"}
    for q in a:
        ql = q.lower()
        assert not any(t in ql for t in banned), q


def test_reranker_batcher_ood_negatives(monkeypatch):
    """With ood_frac=1.0, EVERY negative prompt must embed a junk query
    from the training split (and the mined-negative path must never run);
    with ood_frac=0.0 no junk query may appear."""
    from rust_local_rag_tpu.models.reranker_service import (
        DEFAULT_PROMPT_TEMPLATE,
    )
    from rust_local_rag_tpu.models.tokenizer import HfTokenizer
    from rust_local_rag_tpu.training.ood import junk_queries
    from rust_local_rag_tpu.training.train_reranker import PromptPairBatcher

    tok = HfTokenizer(ASSET_TOK)
    pars = [
        f"paragraph {i} " + " ".join(f"word{i}x{j}" for j in range(20))
        for i in range(24)
    ]
    b = PromptPairBatcher(
        pars, tok, DEFAULT_PROMPT_TEMPLATE, seq_len=96, seed=0,
        index_size=24, ood_frac=1.0,
    )
    junk_pool = set(junk_queries(4096, seed=0, split="train"))

    captured = []
    real_prompt = PromptPairBatcher._prompt

    def spy_prompt(self, q, text):
        captured.append(q)
        return real_prompt(self, q, text)

    monkeypatch.setattr(PromptPairBatcher, "_prompt", spy_prompt)
    mined_calls = []
    monkeypatch.setattr(
        PromptPairBatcher, "_mined_negative",
        lambda self, q, avoid: mined_calls.append(q) or self.paragraphs[0],
    )
    pi, pm, ni, nm = b.batch(8)
    assert pi.shape == ni.shape == (8, 96)
    assert pm.sum() > 0 and nm.sum() > 0
    # prompts alternate pos, then 8 negs? batch() builds pos list then neg
    # list per example in one loop: order is pos,neg,pos,neg...
    neg_queries = captured[1::2]
    assert len(neg_queries) == 8
    assert all(q in junk_pool for q in neg_queries), neg_queries
    assert not mined_calls  # ood path replaced every mined negative

    captured.clear()
    b0 = PromptPairBatcher(
        pars, tok, DEFAULT_PROMPT_TEMPLATE, seq_len=96, seed=0,
        index_size=24, ood_frac=0.0,
    )
    b0.batch(8)
    assert all(q not in junk_pool for q in captured[1::2])
