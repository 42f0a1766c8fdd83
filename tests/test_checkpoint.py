"""Model checkpoint roundtrip: train -> save -> reload -> identical output."""

import numpy as np
import jax
import jax.numpy as jnp

from rust_local_rag_tpu.models.checkpoint import load_params, save_params
from rust_local_rag_tpu.models.encoder import (
    EncoderConfig,
    TransformerEncoderModel,
    encoder_forward,
    init_encoder_params,
)

CFG = EncoderConfig(
    vocab_size=128, dim=16, depth=2, heads=2, ffn_dim=32, max_len=16,
    activation_dtype="float32", out_dim=16,
)


def test_roundtrip_identical_forward(tmp_path):
    params = init_encoder_params(jax.random.PRNGKey(0), CFG)
    path = str(tmp_path / "enc.safetensors")
    save_params(params, path)
    loaded = load_params(path)

    ids = jnp.asarray(np.random.default_rng(0).integers(4, 128, (2, 8)), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    a = encoder_forward(params, ids, mask, CFG)
    b = encoder_forward(loaded, ids, mask, CFG)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_model_loads_checkpoint_at_startup(tmp_path):
    params = init_encoder_params(jax.random.PRNGKey(7), CFG)
    path = str(tmp_path / "enc.safetensors")
    save_params(params, path)
    m = TransformerEncoderModel(cfg=CFG, model_name="ckpt-test", weights_path=path)
    # forward through the model wrapper must equal raw forward with the
    # saved params
    out = m.encode(["hello world"])
    ids, mask = m.tokenizer.encode_batch(["hello world"])
    want = encoder_forward(params, jnp.asarray(ids), jnp.asarray(mask), CFG)
    np.testing.assert_allclose(out, np.asarray(want)[:1], rtol=1e-6)


def test_train_then_checkpoint_resume(tmp_path):
    """Distributed train step -> save -> resume -> loss continues down."""
    from rust_local_rag_tpu.parallel.mesh import build_mesh
    from rust_local_rag_tpu.parallel.train import (
        make_train_step,
        place_batch,
        shard_params,
    )

    mesh = build_mesh((4, 2), ("data", "model"))
    params = shard_params(init_encoder_params(jax.random.PRNGKey(0), CFG), mesh, CFG)
    step = make_train_step(mesh, CFG, lr=1e-2)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, 128, (8, 8)), jnp.int32)
    mask = jnp.ones((8, 8), jnp.int32)
    batch = place_batch((ids, mask, ids, mask), mesh)

    params, loss1 = step(params, *batch)
    path = str(tmp_path / "mid.safetensors")
    save_params(jax.device_get(params), path)

    resumed = shard_params(load_params(path), mesh, CFG)
    resumed, loss2 = step(resumed, *batch)
    assert float(loss2) < float(loss1)


def test_save_non_contiguous_params_roundtrips_exactly(tmp_path):
    """Regression: jax.device_get can hand back transposed-layout VIEWS
    (strided, non-C-contiguous); safetensors serializes raw buffers, so
    without ascontiguousarray the saved tensor is silently scrambled —
    this shipped corrupted lm_heads in every pre-fix trained asset."""
    import numpy as np

    from rust_local_rag_tpu.models.checkpoint import save_params
    from rust_local_rag_tpu.models.encoder import load_safetensors_params

    rng = np.random.default_rng(0)
    base = rng.standard_normal((64, 48)).astype(np.float32)
    view = base.T  # (48, 64) non-contiguous view
    assert not view.flags["C_CONTIGUOUS"]
    params = {"lm_head": view, "embed": base,
              "layers": [{"wq": base[:16, :16].T}]}
    path = tmp_path / "nc.safetensors"
    save_params(params, str(path))
    loaded = load_safetensors_params(str(path))
    np.testing.assert_array_equal(np.asarray(loaded["lm_head"]), view)
    np.testing.assert_array_equal(
        np.asarray(loaded["layers"][0]["wq"]), base[:16, :16].T
    )
