"""On-TPU text embedding encoder (nomic-embed-text class, 768-d).

This replaces the reference's Ollama /api/embed HTTP client
(embeddings.rs:60-182): instead of shipping chunk text over HTTP to an
external model server, chunks are tokenized on host and embedded as batched
MXU matmuls on device — the ≥50k chunks/s ingest path.

Architecture (own design, TPU-first; not a port of any checkpoint format):
  * pre-RMSNorm transformer encoder
  * rotary position embeddings (no learned positions, any length ≤ max_len)
  * SwiGLU feed-forward
  * masked mean pooling + L2 normalization
  * f32 parameters, bf16 activations/matmuls with f32 accumulation

Weights can be loaded from a local safetensors file (ENCODER_WEIGHTS env)
whose tensors follow this module's naming; otherwise the model runs with
seeded random init — the full performance path without pretrained quality,
which the deterministic HashEncoder covers for tests.
"""

from __future__ import annotations

import functools
import logging
import os
from dataclasses import dataclass
from typing import Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from rust_local_rag_tpu.models.tokenizer import bucket_batch, load_tokenizer

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 30528
    dim: int = 768
    depth: int = 12
    heads: int = 12
    ffn_dim: int = 2048  # SwiGLU inner width
    max_len: int = 512
    rope_base: float = 10000.0
    activation_dtype: str = "bfloat16"
    # Output embedding width. The retrieval contract is 768-d
    # (nomic-embed-text class); when out_dim != dim a learned projection
    # maps the pooled representation up/down, letting the transformer trunk
    # be narrower (faster ingest) than the index dimension.
    out_dim: int = 768

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads

    def to_json(self) -> str:
        import dataclasses
        import json

        return json.dumps(dataclasses.asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "EncoderConfig":
        import json

        return cls(**json.loads(s))


def init_encoder_params(rng: jax.Array, cfg: EncoderConfig) -> Dict:
    """Seeded random init; returns a pytree of f32 arrays."""
    keys = jax.random.split(rng, cfg.depth + 2)
    scale = 0.02

    def dense(key, shape):
        return (jax.random.normal(key, shape, dtype=jnp.float32) * scale)

    params: Dict = {
        "embed": dense(keys[0], (cfg.vocab_size, cfg.dim)),
        "final_norm": jnp.ones((cfg.dim,), dtype=jnp.float32),
        "layers": [],
    }
    if cfg.out_dim != cfg.dim:
        params["out_proj"] = dense(keys[-1], (cfg.dim, cfg.out_dim))
    for li in range(cfg.depth):
        k = jax.random.split(keys[li + 1], 7)
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


def _rmsnorm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * weight).astype(x.dtype)


def _rope(cfg: EncoderConfig, seq_len: int) -> tuple[jax.Array, jax.Array]:
    half = cfg.head_dim // 2
    freqs = cfg.rope_base ** (
        -jnp.arange(0, half, dtype=jnp.float32) / half
    )
    t = jnp.arange(seq_len, dtype=jnp.float32)
    angles = jnp.outer(t, freqs)  # [L, half]
    return jnp.cos(angles), jnp.sin(angles)


def _apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, H, L, Dh]; rotate pairs (even, odd) halves."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    c = cos[None, None, :, :]
    s = sin[None, None, :, :]
    return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)


def encoder_forward(
    params: Dict,
    ids: jax.Array,
    mask: jax.Array,
    cfg: EncoderConfig,
    fused_attn: Optional[bool] = None,
) -> jax.Array:
    """[B, L] ids + mask -> [B, dim] L2-normalized f32 embeddings.

    fused_attn: use the Pallas fused-attention kernel (ops/attention.py),
    which keeps the [B, H, L, L] score tensor out of HBM. Defaults to
    use_fused_attention() — OPT-IN via RAG_TPU_FUSED_ATTN=1, off
    otherwise (the kernel measured slower end-to-end on this toolchain;
    see ops/attention.py); training passes False (pallas_call has no VJP
    here).
    """
    act_dtype = jnp.dtype(cfg.activation_dtype)
    B, L = ids.shape
    H, Dh = cfg.heads, cfg.head_dim
    if fused_attn is None:
        # imported at call time but OUTSIDE any tracing hazard note: lazy
        # imports inside traced functions execute module bodies under the
        # trace — ops/__init__ used to materialize constants as tracers
        # this way. The attention module itself keeps no device-array
        # module state, and ops/topk's constants are now python floats.
        from rust_local_rag_tpu.ops.attention import use_fused_attention

        fused_attn = use_fused_attention()

    x = params["embed"][ids].astype(act_dtype)  # [B, L, D]
    cos, sin = _rope(cfg, L)
    attn_bias = jnp.where(
        mask[:, None, None, :].astype(bool), 0.0, -1e9
    ).astype(jnp.float32)

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
                q.astype(act_dtype), k.astype(act_dtype), v, mask
            )
        else:
            scores = (
                jnp.einsum(
                    "bhld,bhmd->bhlm", q, k,
                    preferred_element_type=jnp.float32,
                )
                / np.sqrt(Dh)
                + attn_bias
            )
            probs = jax.nn.softmax(scores, axis=-1).astype(act_dtype)
            ctx = jnp.einsum("bhlm,bhmd->bhld", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, cfg.dim)
        x = x + jnp.einsum("bld,de->ble", ctx, layer["wo"].astype(act_dtype))

        h = _rmsnorm(x, layer["ffn_norm"])
        gate = jnp.einsum("bld,df->blf", h, layer["w_gate"].astype(act_dtype))
        up = jnp.einsum("bld,df->blf", h, layer["w_up"].astype(act_dtype))
        ff = jax.nn.silu(gate) * up
        x = x + jnp.einsum("blf,fd->bld", ff, layer["w_down"].astype(act_dtype))

    x = _rmsnorm(x, params["final_norm"]).astype(jnp.float32)

    # masked mean pooling
    m = mask.astype(jnp.float32)[:, :, None]
    pooled = jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)

    if cfg.out_dim != cfg.dim:
        pooled = jnp.einsum(
            "bd,de->be",
            pooled,
            params["out_proj"].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )

    # L2 normalize (reference normalizes all embeddings: rag_engine.rs:359)
    norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
    return pooled / jnp.maximum(norm, 1e-10)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _jit_forward(params, ids, mask, cfg):
    return encoder_forward(params, ids, mask, cfg)


def default_asset(name: str) -> Optional[str]:
    """Path of a committed model asset (assets/<name>) if present. Trained
    checkpoints live there so the serving stack gets real model quality by
    default — the analog of the reference's `ollama pull` artifacts.
    RAG_TPU_NO_DEFAULT_ASSETS=1 disables (tests, from-scratch training)."""
    if os.environ.get("RAG_TPU_NO_DEFAULT_ASSETS"):
        return None
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets",
        name,
    )
    return path if os.path.exists(path) else None


class TransformerEncoderModel:
    """Tokenize-on-host, embed-on-device encoder with bucketed shapes."""

    def __init__(
        self,
        cfg: Optional[EncoderConfig] = None,
        model_name: str = "nomic-embed-text",
        seed: int = 0,
        weights_path: Optional[str] = None,
        tokenizer_path: Optional[str] = None,
    ):
        weights_path = (
            weights_path
            or os.environ.get("ENCODER_WEIGHTS")
            or default_asset("encoder.safetensors")
        )
        tokenizer_path = (
            tokenizer_path
            or os.environ.get("TOKENIZER_PATH")
            or default_asset("tokenizer.json")
        )
        self._model_name = model_name
        # Task prefixes (nomic-embed-text-class dual prompting: queries and
        # documents are marked so the encoder can separate the two text
        # registers). Read from checkpoint metadata; empty for config-less
        # or random-init models.
        self._query_prefix = ""
        self._doc_prefix = ""
        if weights_path and os.path.exists(weights_path):
            self.params, meta_cfg, meta = load_encoder_checkpoint_full(
                weights_path
            )
            # an explicit cfg arg wins; otherwise the checkpoint's embedded
            # config (falling back to defaults for config-less files)
            self.cfg = cfg or meta_cfg or EncoderConfig()
            self._query_prefix = meta.get("query_prefix", "")
            self._doc_prefix = meta.get("document_prefix", "")
            logger.info("Loaded encoder weights from %s", weights_path)
        else:
            self.cfg = cfg or EncoderConfig()
            self.params = init_encoder_params(
                jax.random.PRNGKey(seed), self.cfg
            )
            logger.info(
                "Encoder running with seeded random init (no weights file)"
            )
        self.tokenizer = load_tokenizer(
            tokenizer_path, vocab_size=self.cfg.vocab_size, max_len=self.cfg.max_len
        )

    @property
    def dim(self) -> int:
        return self.cfg.out_dim

    @property
    def model_name(self) -> str:
        return self._model_name

    def encode(self, texts: Sequence[str], _prefix: Optional[str] = None) -> np.ndarray:
        """[n] texts -> [n, out_dim] f32 unit-normalized embeddings.
        Document-side by default (document task prefix when trained)."""
        if not texts:
            return np.zeros((0, self.cfg.out_dim), dtype=np.float32)
        prefix = self._doc_prefix if _prefix is None else _prefix
        if prefix:
            texts = [prefix + t for t in texts]
        ids, mask = self.tokenizer.encode_batch(texts)
        n = ids.shape[0]
        nb = bucket_batch(n)  # bound compiled batch shapes
        if nb > n:
            pad = np.zeros((nb - n, ids.shape[1]), dtype=ids.dtype)
            ids = np.concatenate([ids, pad], axis=0)
            mask = np.concatenate(
                [mask, np.zeros_like(pad)], axis=0
            )
            mask[n:, 0] = 1  # one valid token so pooling stays finite
        out = _jit_forward(
            self.params, jnp.asarray(ids), jnp.asarray(mask), self.cfg
        )
        return np.asarray(out)[:n]

    def encode_queries(self, texts: Sequence[str]) -> np.ndarray:
        return self.encode(texts, _prefix=self._query_prefix)

    def encode_queries_device(self, texts: Sequence[str]):
        """Query-side encoding that KEEPS the result on device: returns a
        [bucket_batch(n), out_dim] f32 unit-normalized jax Array (padded
        rows are valid unit vectors the caller must drop). Skipping the
        host fetch saves a full device->host RPC (~40-50 ms on a
        remote-attached TPU) when the embeddings feed straight into the
        search program."""
        texts = [self._query_prefix + t for t in texts] \
            if self._query_prefix else list(texts)
        ids, mask = self.tokenizer.encode_batch(texts)
        n = ids.shape[0]
        nb = bucket_batch(n)
        if nb > n:
            pad = np.zeros((nb - n, ids.shape[1]), dtype=ids.dtype)
            ids = np.concatenate([ids, pad], axis=0)
            mask = np.concatenate([mask, np.zeros_like(pad)], axis=0)
            mask[n:, 0] = 1
        return _jit_forward(
            self.params, jnp.asarray(ids), jnp.asarray(mask), self.cfg
        )


def load_safetensors_params(path: str) -> Dict:
    """Load a params pytree from a safetensors file with this module's
    naming: embed, final_norm, layers.N.{attn_norm,wq,wk,wv,wo,ffn_norm,
    w_gate,w_up,w_down}. Half-precision storage (committed checkpoints ship
    f16 to halve repo size) is widened back to f32 compute params."""
    from safetensors.numpy import load_file

    flat = load_file(path)
    layers: Dict[int, Dict[str, jax.Array]] = {}
    params: Dict = {"layers": []}
    for key, val in flat.items():
        if val.dtype == np.float16:
            val = val.astype(np.float32)
        arr = jnp.asarray(val)
        if key.startswith("layers."):
            _, idx, name = key.split(".", 2)
            layers.setdefault(int(idx), {})[name] = arr
        else:
            params[key] = arr
    for i in sorted(layers):
        params["layers"].append(layers[i])
    return params


def load_encoder_checkpoint_full(path: str):
    """-> (params, EncoderConfig | None, metadata dict)."""
    from safetensors import safe_open

    params = load_safetensors_params(path)
    with safe_open(path, framework="np") as f:
        meta = f.metadata() or {}
    cfg_json = meta.get("encoder_config")
    cfg = EncoderConfig.from_json(cfg_json) if cfg_json else None
    return params, cfg, meta


def load_encoder_checkpoint(path: str):
    """-> (params, EncoderConfig | None): params plus the architecture
    config embedded in the safetensors metadata by training/ (None for
    config-less weight files)."""
    params, cfg, _ = load_encoder_checkpoint_full(path)
    return params, cfg
