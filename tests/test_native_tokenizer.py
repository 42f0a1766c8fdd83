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
