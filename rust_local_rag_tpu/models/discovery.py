"""Local model-asset discovery.

The reference's TUI populates its model dropdowns by asking Ollama which
models are pulled (bin/rag_tui/ollama.rs:71-111). A TPU deployment has no
model server to ask; the equivalent inventory is the set of local
checkpoint artifacts: the committed assets, any file pointed at by
ENCODER_WEIGHTS / RERANKER_WEIGHTS, and every *.safetensors under
RAG_TPU_MODELS_DIR — plus the hermetic fake backends, which are real,
selectable operating modes of this framework.

Each entry: {"name", "kind", "path", "detail"} where kind is
"checkpoint" | "hermetic" | "disabled".
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional


def _checkpoint_detail(path: str) -> str:
    """Architecture summary from the safetensors metadata, if embedded."""
    try:
        from safetensors import safe_open

        with safe_open(path, framework="np") as f:
            meta = f.metadata() or {}
        cfg = meta.get("encoder_config") or meta.get("reranker_config")
        if cfg:
            c = json.loads(cfg)
            arch = (
                f"{c.get('depth', '?')}L x {c.get('dim', '?')}d"
                + (
                    f" -> {c['out_dim']}d"
                    if c.get("out_dim") and c.get("out_dim") != c.get("dim")
                    else ""
                )
            )
            extra = meta.get("trained_steps")
            return arch + (f", {extra} steps" if extra else "")
        return "no embedded config"
    except Exception:  # noqa: BLE001 — unreadable/foreign file
        return "unreadable metadata"


def _assets_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets"
    )


def _seen_add(out: List[Dict], seen: set, path: str, name: str) -> None:
    real = os.path.realpath(path)
    if real in seen or not os.path.isfile(path):
        return
    seen.add(real)
    out.append(
        {
            "name": name,
            "kind": "checkpoint",
            "path": path,
            "detail": _checkpoint_detail(path),
        }
    )


def discover_encoder_models() -> List[Dict]:
    out: List[Dict] = []
    seen: set = set()
    _seen_add(
        out, seen, os.path.join(_assets_dir(), "encoder.safetensors"),
        "assets/encoder.safetensors",
    )
    env = os.environ.get("ENCODER_WEIGHTS")
    if env:
        _seen_add(out, seen, env, env)
    for path in sorted(
        glob.glob(
            os.path.join(
                os.environ.get("RAG_TPU_MODELS_DIR", ""), "*.safetensors"
            )
        )
        if os.environ.get("RAG_TPU_MODELS_DIR")
        else []
    ):
        _seen_add(out, seen, path, path)
    out.append(
        {
            "name": "hash-encoder",
            "kind": "hermetic",
            "path": None,
            "detail": "deterministic vocabulary-free encoder "
            "(RAG_TPU_FAKE_ENCODER=1)",
        }
    )
    return out


def discover_rerank_models() -> List[Dict]:
    out: List[Dict] = []
    seen: set = set()
    _seen_add(
        out, seen, os.path.join(_assets_dir(), "reranker.safetensors"),
        "assets/reranker.safetensors",
    )
    env = os.environ.get("RERANKER_WEIGHTS")
    if env:
        _seen_add(out, seen, env, env)
    if os.environ.get("RAG_TPU_MODELS_DIR"):
        for path in sorted(
            glob.glob(
                os.path.join(
                    os.environ["RAG_TPU_MODELS_DIR"], "*reranker*.safetensors"
                )
            )
        ):
            _seen_add(out, seen, path, path)
    out.append(
        {
            "name": "fake-rr",
            "kind": "hermetic",
            "path": None,
            "detail": "deterministic reranker (RAG_TPU_FAKE_RERANKER=1)",
        }
    )
    out.append(
        {
            "name": "",
            "kind": "disabled",
            "path": None,
            "detail": "reranking disabled (empty model name)",
        }
    )
    return out


def discover_models() -> Dict[str, List[Dict]]:
    return {
        "embedding": discover_encoder_models(),
        "rerank": discover_rerank_models(),
    }


def choices_for_key(key: str) -> Optional[List[str]]:
    """Dropdown choices for a settings key (the TUI's ollama.rs:71-111
    analog); None when the key has no discoverable choices."""
    if key == "ENCODER_WEIGHTS":
        return [
            m["path"]
            for m in discover_encoder_models()
            if m["kind"] == "checkpoint"
        ] + [""]
    if key == "RERANKER_WEIGHTS":
        return [
            m["path"]
            for m in discover_rerank_models()
            if m["kind"] == "checkpoint"
        ] + [""]
    if key == "RAG_TPU_RERANK_MODEL":
        return [m["name"] for m in discover_rerank_models()]
    return None
