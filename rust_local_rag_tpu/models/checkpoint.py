"""Model checkpointing: params pytree <-> safetensors.

Completes the checkpoint/resume story for trained encoders/rerankers
(SURVEY.md §5.4 covers the index + job stores; this covers model weights):
save after fine-tuning (parallel/train.py), load at startup via
ENCODER_WEIGHTS / RERANKER_WEIGHTS. Flat naming matches
models/encoder.load_safetensors_params: `embed`, `final_norm`, `lm_head`,
`layers.N.<name>`.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def flatten_params(params: Dict) -> Dict[str, np.ndarray]:
    # ascontiguousarray is LOAD-BEARING: jax.device_get can return a
    # strided VIEW when XLA chose a transposed physical layout for a
    # tensor (measured: a trained reranker lm_head came back with strides
    # (4, 1536) on a (384, 8193) array), and safetensors' save_file
    # serializes the raw buffer — silently scrambling the tensor on disk.
    # That bug shipped corrupted lm_heads in every pre-fix asset: ranking
    # partly survived (pair acc 0.744 -> 0.695) but absolute calibration
    # was destroyed (cls acc 0.611 -> 0.500, OOD yes-p 0.001 -> 0.388),
    # which is why no rejection threshold ever separated junk from real.
    flat: Dict[str, np.ndarray] = {}
    for key, val in params.items():
        if key == "layers":
            for i, layer in enumerate(val):
                for name, arr in layer.items():
                    flat[f"layers.{i}.{name}"] = np.ascontiguousarray(arr)
        else:
            flat[key] = np.ascontiguousarray(val)
    return flat


def save_params(
    params: Dict,
    path: str,
    metadata: Dict[str, str] | None = None,
    half: bool = False,
) -> None:
    """Write a params pytree to a safetensors file (atomic via temp+rename).

    `metadata` rides in the safetensors header (training/ stores the
    architecture config there; models/encoder.load_encoder_checkpoint reads
    it back). `half=True` stores float tensors as f16 — committed assets
    ship half-precision to halve repo size; loaders widen to f32.
    """
    import os
    import tempfile

    from safetensors.numpy import save_file

    flat = flatten_params(params)
    if half:
        flat = {
            k: (v.astype(np.float16) if v.dtype == np.float32 else v)
            for k, v in flat.items()
        }
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".safetensors.tmp")
    os.close(fd)
    try:
        save_file(flat, tmp, metadata=metadata)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def load_params(path: str) -> Dict:
    """Inverse of save_params (same loader the models use at startup)."""
    from rust_local_rag_tpu.models.encoder import load_safetensors_params

    return load_safetensors_params(path)
