"""Test harness: force an 8-device virtual CPU platform BEFORE jax initializes.

Replaces the reference's mock-rank trick for distribution tests (SURVEY.md §4):
sharding correctness is exercised on a real 8-device mesh of host-CPU devices.
"""

import os
import sys
from pathlib import Path

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# Repo root on sys.path so `import lit_llama_tpu` and the workload scripts work
# without installation (mirrors the reference's script-mode imports).
wd = Path(__file__).parent.parent.resolve()
if str(wd) not in sys.path:
    sys.path.insert(0, str(wd))

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# This image's sitecustomize pre-imports jax and pins JAX_PLATFORMS to the axon
# TPU plugin; env vars set above are then too late, but the config knob still
# works pre-backend-init. Tests must run on the virtual 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")

# The CPU backend's default matmul precision (oneDNN fast path) costs ~2e-3 on
# fp32 logits; golden parity tests need exact fp32 matmuls.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def tiny_config():
    from lit_llama_tpu import LLaMAConfig

    return LLaMAConfig(
        block_size=64, vocab_size=128, n_layer=2, n_head=4, n_embd=64
    )


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
