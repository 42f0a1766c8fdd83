"""Native C++ WordPiece tokenizer: bit-parity with the HF backend.

The native kernel (native/wordpiece.cpp) claims exact equivalence with
models/tokenizer.HfTokenizer for every input — ASCII texts through the
C++ path, everything else through its built-in HF fallback routing. These
tests enforce that claim on curated edge cases (added-token extraction,
specials-in-text, truncation, unicode) and a deterministic fuzz sweep.
"""

import os
import random
import string

import numpy as np
import pytest

from rust_local_rag_tpu.models import native_tokenizer
from rust_local_rag_tpu.models.tokenizer import HfTokenizer, load_tokenizer

TOK_JSON = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "rust_local_rag_tpu", "assets", "tokenizer.json",
)


def _build_native() -> bool:
    if native_tokenizer.available():
        return True
    import subprocess

    native_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
    )
    try:
        subprocess.run(["make", "-C", native_dir], check=True,
                       capture_output=True)
    except Exception:
        return False
    return native_tokenizer.available()


pytestmark = pytest.mark.skipif(
    not (os.path.exists(TOK_JSON) and _build_native()),
    reason="tokenizer asset or native library unavailable",
)


@pytest.fixture(scope="module")
def pair():
    return (
        HfTokenizer(TOK_JSON),
        native_tokenizer.NativeWordPieceTokenizer(TOK_JSON),
    )


EDGE_CASES = [
    "",
    " ",
    "\t\n\r\v\f",
    "hello, world! 3.14",
    # added-token "yes" extracted anywhere, case-insensitively, splitting
    # the surrounding word into fresh pre-tokens
    "yes",
    "Yes YES yEs",
    "bayesian eyes yesterday",
    "yesyes eyesore no",
    "yes" * 200,
    # literal special-token strings match verbatim in raw text (fallback)
    "foo [CLS] bar",
    "[PAD][UNK][CLS][SEP][MASK]",
    "[cls] not special",
    # unicode (fallback): NFD + StripAccents fold to ASCII
    "naïve café étude",
    "Ω ≈ 3.14 → done",
    # WordPiece 64-char word limit
    "a" * 63, "a" * 64, "a" * 65, "x" * 200,
    # punctuation isolation
    "fn main() { println!(\"{}\", x_1 + y._2); } // #[derive(Debug)]",
    "a-b_c.d,e;f:g!h?i",
    "don't can't won't",
    "...---...",
    # digits and mixed runs
    "0x7f 1e-9 v2.6.1 100%",
    "CamelCase UPPERCASE lowercase",
]


def test_tokenize_parity_on_edge_cases(pair):
    hf, nat = pair
    for text in EDGE_CASES:
        assert hf.tokenize(text) == nat.tokenize(text), repr(text)


def test_tokenize_parity_fuzz(pair):
    hf, nat = pair
    rng = random.Random(20260819)
    ascii_pool = string.ascii_letters + string.digits + string.punctuation \
        + " \t\n" + " " * 20
    uni_pool = ascii_pool + "éüñßλ中文🙂"
    for i in range(400):
        pool = ascii_pool if i % 3 else uni_pool
        text = "".join(rng.choice(pool) for _ in range(rng.randint(0, 200)))
        assert hf.tokenize(text) == nat.tokenize(text), repr(text)


def test_encode_batch_parity_mixed_routing(pair):
    """One batch mixing native-path and fallback-path texts must produce
    byte-identical (ids, mask) to the HF backend — same bucket, same
    padding, same row order."""
    hf, nat = pair
    texts = EDGE_CASES + ["plain ascii row %d with words" % i
                          for i in range(17)]
    ia, ma = hf.encode_batch(texts)
    ib, mb = nat.encode_batch(texts)
    assert ia.shape == ib.shape
    assert np.array_equal(ia, ib)
    assert np.array_equal(ma, mb)


def test_encode_batch_truncation_at_max_len(pair):
    hf, nat = pair
    long = "word " * 2000  # tokenizes far past max_len=512
    ia, ma = hf.encode_batch([long, "short"])
    ib, mb = nat.encode_batch([long, "short"])
    assert ia.shape == (2, 512)
    assert np.array_equal(ia, ib) and np.array_equal(ma, mb)
    assert hf.tokenize(long) == nat.tokenize(long)


def test_encode_batch_headtail_parity(pair):
    """The judge encoding (head/tail truncation at the trained length) must
    be byte-identical across backends AND match the trainer's historical
    scheme: head seq_len//3 + tail remainder, fixed [B, seq_len] pad."""
    hf, nat = pair
    texts = EDGE_CASES + ["word%d " % i * 300 for i in range(3)]
    for L in (64, 192):
        ia, ma = hf.encode_batch_headtail(texts, L)
        ib, mb = nat.encode_batch_headtail(texts, L)
        assert ia.shape == (len(texts), L)
        assert np.array_equal(ia, ib) and np.array_equal(ma, mb)
    # truncation layout: head third + tail remainder of the raw ids
    long = "alpha beta gamma " * 200
    full = hf._tok.encode(long).ids
    ids, mask = hf.encode_batch_headtail([long], 192)
    assert mask[0].sum() == 192
    assert ids[0, :64].tolist() == full[:64]
    assert ids[0, 64:].tolist() == full[-128:]


def test_headtail_matches_trainer_encode(pair):
    """training/train_reranker.PromptPairBatcher._encode and the serving
    tokenizer.encode_batch_headtail must produce identical bytes — the r4
    rejection-gate leak was exactly this pair drifting apart."""
    from rust_local_rag_tpu.models.tokenizer import headtail_pack

    hf, _ = pair
    prompts = ["Query: q%d\n\nChunk:\n%s\n\nAnswer:" % (i, "tok " * (i * 60))
               for i in range(6)]
    pad = hf._tok.token_to_id("[PAD]")
    rows = [e.ids for e in hf._tok.encode_batch(prompts)]
    ids_t, mask_t = headtail_pack(rows, 192, pad)
    ids_s, mask_s = hf.encode_batch_headtail(prompts, 192)
    assert np.array_equal(ids_t, ids_s) and np.array_equal(mask_t, mask_s)


def test_vocab_size_and_tok_surface(pair):
    hf, nat = pair
    assert nat.vocab_size == hf.vocab_size
    # trainers reach for the raw HF object via ._tok
    assert nat._tok.get_vocab_size() == hf.vocab_size


def test_load_tokenizer_prefers_native(monkeypatch):
    monkeypatch.delenv("RAG_TPU_NATIVE_TOKENIZER", raising=False)
    t = load_tokenizer(TOK_JSON)
    assert isinstance(t, native_tokenizer.NativeWordPieceTokenizer)
    monkeypatch.setenv("RAG_TPU_NATIVE_TOKENIZER", "0")
    t = load_tokenizer(TOK_JSON)
    assert isinstance(t, HfTokenizer)
