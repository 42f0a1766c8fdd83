"""Distributed contrastive training for the embedding encoder.

The reference cannot train anything — its models live behind Ollama HTTP.
Here the encoder (models/encoder.py) is trainable in-framework so a
deployment can fine-tune retrieval embeddings on its own corpus: standard
InfoNCE over (query, positive-chunk) pairs with in-batch negatives.

Parallelism is GSPMD via jit + NamedSharding over a ("data", "model") mesh:
  * data axis  — batch sharding (DP); gradients all-reduce over ICI.
  * model axis — tensor parallelism: attention projections are sharded on
    the head/output dim, the SwiGLU FFN on its hidden dim, the token
    embedding on the vocab dim. XLA inserts the all-gathers/reduce-scatters.

PP/SP/EP are deliberately absent: an encoder at this scale does not need
pipeline stages, sequences are ~200-token chunks, and there are no experts
(SURVEY.md §2.4, §5.7 record the same analysis for the reference).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rust_local_rag_tpu.models.encoder import EncoderConfig, encoder_forward


def param_partition_specs(cfg: EncoderConfig) -> Dict:
    """PartitionSpecs for the encoder params pytree over ("data", "model")."""
    layer = {
        "attn_norm": P(),
        "wq": P(None, "model"),
        "wk": P(None, "model"),
        "wv": P(None, "model"),
        "wo": P("model", None),
        "ffn_norm": P(),
        "w_gate": P(None, "model"),
        "w_up": P(None, "model"),
        "w_down": P("model", None),
    }
    specs = {
        "embed": P("model", None),
        "final_norm": P(),
        "layers": [dict(layer) for _ in range(cfg.depth)],
    }
    if cfg.out_dim != cfg.dim:
        specs["out_proj"] = P(None, "model")
    return specs


def shard_params(params: Dict, mesh: Mesh, cfg: EncoderConfig) -> Dict:
    specs = param_partition_specs(cfg)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, (jax.Array,)),
    )


def info_nce_loss(
    params: Dict,
    q_ids: jax.Array,
    q_mask: jax.Array,
    p_ids: jax.Array,
    p_mask: jax.Array,
    cfg: EncoderConfig,
    temperature: float = 0.05,
) -> jax.Array:
    """Symmetric InfoNCE with in-batch negatives."""
    # differentiable XLA attention path: the Pallas fused kernel has no VJP
    q = encoder_forward(params, q_ids, q_mask, cfg, fused_attn=False)
    p = encoder_forward(params, p_ids, p_mask, cfg, fused_attn=False)
    logits = (
        jnp.einsum("bd,cd->bc", q, p, preferred_element_type=jnp.float32)
        / temperature
    )
    labels = jnp.arange(logits.shape[0])
    loss_qp = -jnp.mean(
        jax.nn.log_softmax(logits, axis=1)[labels, labels]
    )
    loss_pq = -jnp.mean(
        jax.nn.log_softmax(logits.T, axis=1)[labels, labels]
    )
    return 0.5 * (loss_qp + loss_pq)


def info_nce_loss_hn(
    params: Dict,
    q_ids: jax.Array,
    q_mask: jax.Array,
    p_ids: jax.Array,
    p_mask: jax.Array,
    n_ids: jax.Array,
    n_mask: jax.Array,
    cfg: EncoderConfig,
    temperature: float = 0.05,
) -> jax.Array:
    """InfoNCE with explicit hard negatives (DPR-style).

    Each query scores against [positives; mined hard negatives] — a
    [B, 2B] softmax where column i is the positive and column B+i is the
    query's OWN BM25-mined keyword trap (other rows' negatives act as
    extra in-batch negatives). The passage->query direction only uses the
    positive block (hard negatives have no paired query).
    """
    q = encoder_forward(params, q_ids, q_mask, cfg, fused_attn=False)
    p = encoder_forward(params, p_ids, p_mask, cfg, fused_attn=False)
    n = encoder_forward(params, n_ids, n_mask, cfg, fused_attn=False)
    logits_p = (
        jnp.einsum("bd,cd->bc", q, p, preferred_element_type=jnp.float32)
        / temperature
    )
    logits_n = (
        jnp.einsum("bd,cd->bc", q, n, preferred_element_type=jnp.float32)
        / temperature
    )
    logits = jnp.concatenate([logits_p, logits_n], axis=1)
    labels = jnp.arange(logits_p.shape[0])
    loss_qp = -jnp.mean(jax.nn.log_softmax(logits, axis=1)[labels, labels])
    loss_pq = -jnp.mean(
        jax.nn.log_softmax(logits_p.T, axis=1)[labels, labels]
    )
    return 0.5 * (loss_qp + loss_pq)


def make_train_step(mesh: Mesh, cfg: EncoderConfig, lr: float = 1e-4):
    """Build the jitted distributed SGD train step.

    Inputs shard along "data"; params along "model" per
    param_partition_specs. Returns step(params, batch) -> (params, loss).
    """
    data_spec = NamedSharding(mesh, P("data", None))
    replicated = NamedSharding(mesh, P())
    param_shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), param_partition_specs(cfg)
    )

    def step(params, q_ids, q_mask, p_ids, p_mask):
        loss, grads = jax.value_and_grad(info_nce_loss)(
            params, q_ids, q_mask, p_ids, p_mask, cfg
        )
        new_params = jax.tree_util.tree_map(
            lambda w, g: w - lr * g, params, grads
        )
        return new_params, loss

    return jax.jit(
        step,
        in_shardings=(
            param_shardings,
            data_spec,
            data_spec,
            data_spec,
            data_spec,
        ),
        out_shardings=(param_shardings, replicated),
        donate_argnums=(0,),
    )


def make_optax_scan_step(
    mesh: Mesh,
    cfg: EncoderConfig,
    tx,
    temperature: float = 0.05,
):
    """AdamW-class training with several optimizer steps per device
    dispatch: inputs are [S, B, L] stacks and a lax.scan chains S InfoNCE
    steps on device (remote-attached TPUs pay ~50 ms per dispatch; scanning
    amortizes it). Sharding is GSPMD like make_train_step: batch along
    "data", params along "model" per param_partition_specs.

    Returns step(params, opt_state, q_ids, q_mask, p_ids, p_mask)
    -> (params, opt_state, mean_loss).
    """
    data_spec = NamedSharding(mesh, P(None, "data", None))
    replicated = NamedSharding(mesh, P())
    param_shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), param_partition_specs(cfg)
    )

    def one_step(carry, batch):
        params, opt_state = carry
        q_ids, q_mask, p_ids, p_mask = batch
        loss, grads = jax.value_and_grad(info_nce_loss)(
            params, q_ids, q_mask, p_ids, p_mask, cfg, temperature
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    def step(params, opt_state, q_ids, q_mask, p_ids, p_mask):
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), (q_ids, q_mask, p_ids, p_mask)
        )
        return params, opt_state, jnp.mean(losses)

    return jax.jit(
        step,
        in_shardings=(
            param_shardings,
            None,
            data_spec,
            data_spec,
            data_spec,
            data_spec,
        ),
        out_shardings=(param_shardings, None, replicated),
        donate_argnums=(0, 1),
    )


def make_optax_scan_step_hn(
    mesh: Mesh,
    cfg: EncoderConfig,
    tx,
    temperature: float = 0.05,
):
    """make_optax_scan_step with hard negatives: inputs are [S, B, L]
    stacks of (q_ids, q_mask, p_ids, p_mask, n_ids, n_mask) and the loss
    is info_nce_loss_hn. Sharding identical (batch on "data", params per
    param_partition_specs, donated)."""
    data_spec = NamedSharding(mesh, P(None, "data", None))
    replicated = NamedSharding(mesh, P())
    param_shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), param_partition_specs(cfg)
    )

    def one_step(carry, batch):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(info_nce_loss_hn)(
            params, *batch, cfg, temperature
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    def step(params, opt_state, qi, qm, pi, pm, ni, nm):
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), (qi, qm, pi, pm, ni, nm)
        )
        return params, opt_state, jnp.mean(losses)

    return jax.jit(
        step,
        in_shardings=(param_shardings, None) + (data_spec,) * 6,
        out_shardings=(param_shardings, None, replicated),
        donate_argnums=(0, 1),
    )


def place_batch(batch: Tuple, mesh: Mesh):
    """Place (q_ids, q_mask, p_ids, p_mask) sharded along "data"."""
    sharding = NamedSharding(mesh, P("data", None))
    return tuple(jax.device_put(x, sharding) for x in batch)
