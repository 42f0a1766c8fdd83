"""Test configuration: force an 8-device virtual CPU platform BEFORE jax
imports, so sharding tests exercise a real mesh without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU through
# the config API as well (must happen before any computation).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)

# Pallas kernels run in interpreter mode on the CPU test platform.
os.environ.setdefault("RAG_TPU_PALLAS_INTERPRET", "1")

# Hermetic by default: tests must not silently depend on committed model
# assets (trained encoder/tokenizer); tests that exercise the assets opt
# back in by clearing this.
os.environ.setdefault("RAG_TPU_NO_DEFAULT_ASSETS", "1")
