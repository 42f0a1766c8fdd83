"""On-TPU cross-scoring reranker.

The reference reranks by sending each candidate to Ollama sequentially —
concurrency 1, 60 s timeout per candidate, ~20-30 s per query total
(reranker.rs:228-268; SURVEY.md §3.2 "DOMINANT LATENCY"). Here the whole
candidate set is scored in ONE batched decoder forward pass: build
(query, chunk) prompts, tokenize, pad to a bucket, run the model, read the
yes/no token logits at the last prompt position, and apply the same softmax
formula the reference uses on Ollama logprobs:

    score = e^yes / (e^yes + e^no)        (reranker.rs:519-588)

with a missing side defaulting to -10.0.

The decoder is a llama-class causal transformer (rotary, SwiGLU, RMSNorm),
own design. A deterministic FakeReranker provides hermetic scoring with the
same interface (yes/no logprobs included) for tests.
"""

from __future__ import annotations

import functools
import logging
import math
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from rust_local_rag_tpu.models.tokenizer import bucket_batch, load_tokenizer
from rust_local_rag_tpu.models.fake_encoder import HashEncoder

logger = logging.getLogger(__name__)

MISSING_LOGPROB = -10.0  # reranker.rs:567-568


@dataclass(frozen=True)
class RerankerConfig:
    vocab_size: int = 30528
    dim: int = 512
    depth: int = 8
    heads: int = 8
    ffn_dim: int = 1536
    max_len: int = 512
    rope_base: float = 10000.0
    activation_dtype: str = "bfloat16"

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads

    def to_json(self) -> str:
        import dataclasses
        import json

        return json.dumps(dataclasses.asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "RerankerConfig":
        import json

        return cls(**json.loads(s))


def init_reranker_params(rng: jax.Array, cfg: RerankerConfig) -> Dict:
    keys = jax.random.split(rng, cfg.depth + 3)
    scale = 0.02

    def dense(key, shape):
        return jax.random.normal(key, shape, dtype=jnp.float32) * scale

    params: Dict = {
        "embed": dense(keys[0], (cfg.vocab_size, cfg.dim)),
        "final_norm": jnp.ones((cfg.dim,), dtype=jnp.float32),
        "lm_head": dense(keys[1], (cfg.dim, cfg.vocab_size)),
        "layers": [],
    }
    for li in range(cfg.depth):
        k = jax.random.split(keys[li + 2], 7)
        params["layers"].append(
            {
                "attn_norm": jnp.ones((cfg.dim,), dtype=jnp.float32),
                "wq": dense(k[0], (cfg.dim, cfg.dim)),
                "wk": dense(k[1], (cfg.dim, cfg.dim)),
                "wv": dense(k[2], (cfg.dim, cfg.dim)),
                "wo": dense(k[3], (cfg.dim, cfg.dim)),
                "ffn_norm": jnp.ones((cfg.dim,), dtype=jnp.float32),
                "w_gate": dense(k[4], (cfg.dim, cfg.ffn_dim)),
                "w_up": dense(k[5], (cfg.dim, cfg.ffn_dim)),
                "w_down": dense(k[6], (cfg.ffn_dim, cfg.dim)),
            }
        )
    return params


def _rmsnorm(x, weight, eps=1e-6):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * weight).astype(x.dtype)


def _rope_tables(cfg: RerankerConfig, seq_len: int):
    half = cfg.head_dim // 2
    freqs = cfg.rope_base ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    t = jnp.arange(seq_len, dtype=jnp.float32)
    angles = jnp.outer(t, freqs)
    return jnp.cos(angles), jnp.sin(angles)


def _apply_rope(x, cos, sin):
    x1, x2 = jnp.split(x, 2, axis=-1)
    c = cos[None, None, :, :]
    s = sin[None, None, :, :]
    return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)


def reranker_forward_last_logits(
    params: Dict,
    ids: jax.Array,
    mask: jax.Array,
    cfg: RerankerConfig,
    fused_attn: Optional[bool] = None,
) -> jax.Array:
    """Causal decoder forward; returns f32 logits at each sequence's last
    valid position: [B, vocab].

    fused_attn: Pallas fused attention (ops/attention.py, causal variant) —
    OPT-IN via RAG_TPU_FUSED_ATTN=1 (off by default: slower end-to-end on
    this toolchain, see ops/attention.py); training passes False (no
    VJP)."""
    act_dtype = jnp.dtype(cfg.activation_dtype)
    B, L = ids.shape
    H, Dh = cfg.heads, cfg.head_dim
    if fused_attn is None:
        from rust_local_rag_tpu.ops.attention import use_fused_attention

        fused_attn = use_fused_attention()

    x = params["embed"][ids].astype(act_dtype)
    cos, sin = _rope_tables(cfg, L)

    causal = jnp.tril(jnp.ones((L, L), dtype=bool))
    pad_ok = mask[:, None, None, :].astype(bool)
    bias = jnp.where(causal[None, None, :, :] & pad_ok, 0.0, -1e9).astype(
        jnp.float32
    )

    for layer in params["layers"]:
        h = _rmsnorm(x, layer["attn_norm"])
        q = jnp.einsum("bld,de->ble", h, layer["wq"].astype(act_dtype))
        k = jnp.einsum("bld,de->ble", h, layer["wk"].astype(act_dtype))
        v = jnp.einsum("bld,de->ble", h, layer["wv"].astype(act_dtype))
        q = q.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        if fused_attn:
            from rust_local_rag_tpu.ops.attention import fused_attention

            ctx = fused_attention(
                q.astype(act_dtype), k.astype(act_dtype), v, mask,
                causal=True,
            )
        else:
            scores = (
                jnp.einsum(
                    "bhld,bhmd->bhlm", q, k,
                    preferred_element_type=jnp.float32,
                )
                / math.sqrt(Dh)
                + bias
            )
            probs = jax.nn.softmax(scores, axis=-1).astype(act_dtype)
            ctx = jnp.einsum("bhlm,bhmd->bhld", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, cfg.dim)
        x = x + jnp.einsum("bld,de->ble", ctx, layer["wo"].astype(act_dtype))

        h = _rmsnorm(x, layer["ffn_norm"])
        ff = jax.nn.silu(
            jnp.einsum("bld,df->blf", h, layer["w_gate"].astype(act_dtype))
        ) * jnp.einsum("bld,df->blf", h, layer["w_up"].astype(act_dtype))
        x = x + jnp.einsum("blf,fd->bld", ff, layer["w_down"].astype(act_dtype))

    x = _rmsnorm(x, params["final_norm"])

    last_pos = jnp.maximum(jnp.sum(mask, axis=1) - 1, 0)  # [B]
    x_last = x[jnp.arange(B), last_pos]  # [B, dim]
    logits = jnp.einsum(
        "bd,dv->bv",
        x_last.astype(jnp.float32),
        params["lm_head"].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return logits


@functools.partial(jax.jit, static_argnames=("cfg",))
def _jit_yes_no_logprobs(params, ids, mask, yes_id, no_id, cfg):
    logits = reranker_forward_last_logits(params, ids, mask, cfg)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    return logprobs[:, yes_id], logprobs[:, no_id]


def softmax_yes_no(yes_lp: Optional[float], no_lp: Optional[float]) -> float:
    """score = e^yes / (e^yes + e^no), missing side -> -10.0
    (reranker.rs:519-588)."""
    y = yes_lp if yes_lp is not None else MISSING_LOGPROB
    n = no_lp if no_lp is not None else MISSING_LOGPROB
    # numerically stable
    m = max(y, n)
    ye, ne = math.exp(y - m), math.exp(n - m)
    return ye / (ye + ne)


class TransformerReranker:
    """Batched on-device yes/no scorer."""

    def __init__(
        self,
        cfg: Optional[RerankerConfig] = None,
        model_name: str = "tpu-reranker",
        seed: int = 1,
        weights_path: Optional[str] = None,
        tokenizer_path: Optional[str] = None,
    ):
        from rust_local_rag_tpu.models.encoder import default_asset

        self._model_name = model_name
        weights_path = (
            weights_path
            or os.environ.get("RERANKER_WEIGHTS")
            or default_asset("reranker.safetensors")
        )
        if weights_path and os.path.exists(weights_path):
            from safetensors import safe_open

            from rust_local_rag_tpu.models.encoder import load_safetensors_params

            self.params = load_safetensors_params(weights_path)
            with safe_open(weights_path, framework="np") as f:
                meta = f.metadata() or {}
            cfg_json = meta.get("reranker_config")
            self.cfg = cfg or (
                RerankerConfig.from_json(cfg_json) if cfg_json else RerankerConfig()
            )
            # Serve-time prompts MUST be encoded exactly like the trainer's
            # (head/tail truncation at the TRAINED sequence length, fixed
            # pad) — head-only truncation at max_len put every long prompt
            # at positions the judge never saw and destroyed the rejection
            # gate's calibration (junk yes-p 0.07 in training vs 0.65 at
            # serve). 192 is the recipe default every shipped judge used;
            # newer checkpoints carry it in metadata.
            self.judge_seq_len = int(meta.get("train_seq_len", "192"))
            logger.info("Loaded reranker weights from %s", weights_path)
        else:
            self.cfg = cfg or RerankerConfig()
            self.params = init_reranker_params(jax.random.PRNGKey(seed), self.cfg)
            self.judge_seq_len = 192
            logger.info("Reranker running with seeded random init")
        tokenizer_path = (
            tokenizer_path
            or os.environ.get("TOKENIZER_PATH")
            or default_asset("tokenizer.json")
        )
        self.tokenizer = load_tokenizer(
            tokenizer_path, vocab_size=self.cfg.vocab_size, max_len=self.cfg.max_len
        )
        # token ids for the yes/no decision: the first ids at which the two
        # words' tokenizations diverge. Robust to special tokens ([CLS]/
        # [SEP] wrappers are a shared prefix/suffix) AND to multi-piece
        # tokenizations ("yes" -> 2 wordpieces no longer silently scores
        # the wrong token — the first DIFFERING piece decides).
        self._yes_id, self._no_id = self._decision_ids("yes", "no")

    def _decision_ids(self, a: str, b: str) -> tuple:
        ta = [int(t) for t in self.tokenizer.tokenize(a)]
        tb = [int(t) for t in self.tokenizer.tokenize(b)]
        for xa, xb in zip(ta, tb):
            if xa != xb:
                return xa, xb
        # one tokenization is a prefix of the other (cannot happen for
        # "yes"/"no" under any sane tokenizer, but fail loudly not wrongly)
        raise ValueError(
            f"tokenizer cannot distinguish {a!r} from {b!r}: {ta} vs {tb}"
        )

    @property
    def model_name(self) -> str:
        return self._model_name

    def dispatch_prompts(self, prompts: Sequence[str]):
        """First half of the scoring pass: tokenize + ONE async device
        dispatch, no blocking fetch. Returns an opaque handle for
        fetch_prompts — the pipelined serving path overlaps the judge's
        device time with the next batch's host work."""
        if not prompts:
            return (None, None, 0)
        # train/serve encoding parity: same truncation scheme, same fixed
        # sequence length the checkpoint was trained at (one compiled seq
        # shape as a bonus — the bucketed path recompiled per length)
        ids, mask = self.tokenizer.encode_batch_headtail(
            list(prompts), self.judge_seq_len
        )
        n = ids.shape[0]
        nb = bucket_batch(n)  # bound compiled batch shapes
        if nb > n:
            pad = np.zeros((nb - n, ids.shape[1]), dtype=ids.dtype)
            ids = np.concatenate([ids, pad], axis=0)
            pm = np.zeros_like(pad)
            pm[:, 0] = 1
            mask = np.concatenate([mask, pm], axis=0)
        yes_lp, no_lp = _jit_yes_no_logprobs(
            self.params,
            jnp.asarray(ids),
            jnp.asarray(mask),
            self._yes_id,
            self._no_id,
            self.cfg,
        )
        return (yes_lp, no_lp, n)

    def fetch_prompts(self, handle) -> List[Tuple[float, float, float]]:
        """Second half: blocking device->host fetch of the dispatched
        logprobs; computes the softmax scores."""
        yes_dev, no_dev, n = handle
        if n == 0:
            return []
        yes_lp = np.asarray(yes_dev, dtype=np.float64)[:n]
        no_lp = np.asarray(no_dev, dtype=np.float64)[:n]
        return [
            (softmax_yes_no(float(y), float(nn)), float(y), float(nn))
            for y, nn in zip(yes_lp, no_lp)
        ]

    def score_prompts(
        self, prompts: Sequence[str]
    ) -> List[Tuple[float, float, float]]:
        """[(score, yes_logprob, no_logprob)] for a batch of prompts —
        one device forward for the whole batch."""
        return self.fetch_prompts(self.dispatch_prompts(prompts))


class FakeReranker:
    """Deterministic reranker for hermetic tests: relevance from hash-encoder
    cosine between query and chunk text, expressed as yes/no logprobs so the
    full scoring formula and blending paths are exercised."""

    def __init__(self, dim: int = 256, model_name: str = "fake-reranker"):
        self._enc = HashEncoder(dim=dim, model_name="fake-rerank-encoder")
        self._model_name = model_name

    @property
    def model_name(self) -> str:
        return self._model_name

    def dispatch_prompts(self, prompts: Sequence[str]):
        """Host-computed scores are already complete at dispatch time; the
        handle IS the result (same dispatch/fetch interface as the
        transformer judge for the pipelined serving lane)."""
        return self.score_prompts(prompts)

    def fetch_prompts(self, handle) -> List[Tuple[float, float, float]]:
        return handle

    def score_prompts(self, prompts: Sequence[str]) -> List[Tuple[float, float, float]]:
        out: List[Tuple[float, float, float]] = []
        for p in prompts:
            # prompts embed the query and chunk; similarity of the whole
            # prompt against its "Query:" line drives a stable pseudo-score
            lines = p.splitlines()
            query = next((l for l in lines if l.lower().startswith("query:")), p)
            chunk_start = next(
                (i for i, l in enumerate(lines) if l.lower().startswith("chunk")), 0
            )
            chunk = "\n".join(lines[chunk_start:]) or p
            sim = float(
                np.dot(self._enc.encode_one(query), self._enc.encode_one(chunk))
            )
            s = min(max(0.5 + 0.5 * sim, 1e-6), 1.0 - 1e-6)
            yes_lp = math.log(s)
            no_lp = math.log(1.0 - s)
            out.append((softmax_yes_no(yes_lp, no_lp), yes_lp, no_lp))
        return out
