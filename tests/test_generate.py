"""Decode-engine and generate-CLI tests (reference: tests/test_generate.py)."""

import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lit_llama_tpu import LLaMAConfig, init_params
from lit_llama_tpu.models.generate import generate, sample_logits

REPO = Path(__file__).parent.parent


@pytest.fixture(scope="module")
def model():
    config = LLaMAConfig(block_size=32, vocab_size=128, n_layer=2, n_head=2, n_embd=32)
    params = init_params(config, jax.random.PRNGKey(0))
    return config, params


def test_greedy_is_deterministic(model):
    config, params = model
    prompt = np.array([1, 5, 7], np.int32)
    out1 = generate(params, prompt, 8, config=config, temperature=0.0)
    out2 = generate(params, prompt, 8, config=config, temperature=0.0)
    assert np.array_equal(out1, out2)
    assert len(out1) == 11
    assert np.array_equal(out1[:3], prompt)


def test_sampling_respects_key(model):
    config, params = model
    prompt = np.array([1, 5, 7], np.int32)
    a = generate(params, prompt, 8, config=config, temperature=1.0, key=jax.random.PRNGKey(1))
    b = generate(params, prompt, 8, config=config, temperature=1.0, key=jax.random.PRNGKey(1))
    c = generate(params, prompt, 8, config=config, temperature=1.0, key=jax.random.PRNGKey(2))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)  # overwhelmingly likely


def test_eos_early_exit(model):
    """Generation stops at eos and includes it (reference: generate.py:88-89)."""
    config, params = model
    prompt = np.array([1, 5, 7], np.int32)
    full = generate(params, prompt, 12, config=config, temperature=0.0)
    # use the first greedily-generated token as a fake eos: stop immediately after
    eos = int(full[3])
    out = generate(params, prompt, 12, config=config, temperature=0.0, eos_id=eos)
    assert len(out) == 4 and out[-1] == eos


def test_sliding_window_generation(model):
    """Generating past max_seq_length engages the rolling cache and keeps going
    (reference: lit_llama/model.py:211-221)."""
    config, params = model
    prompt = np.array([1, 5, 7], np.int32)
    out = generate(params, prompt, 20, config=config, temperature=0.0, max_seq_length=8)
    assert len(out) == 23
    assert np.isfinite(out).all()


def test_top_k_masks_logits():
    logits = jnp.asarray([0.1, 3.0, 2.0, -1.0, 2.5])
    for _ in range(5):
        tok = sample_logits(logits, jax.random.PRNGKey(_), temperature=1.0, top_k=2)
        assert int(tok) in (1, 4)


def test_generate_cli_help():
    """CLI smoke test (reference: tests/test_generate.py:115-119)."""
    out = subprocess.run(
        [sys.executable, str(REPO / "generate.py"), "--help"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0
    assert "--prompt" in out.stdout
    assert "--quantize" in out.stdout


@pytest.mark.slow
def test_generate_cli_end_to_end(tmp_path):
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"}
    r = subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts/make_tiny_checkpoint.py"),
            "--out_dir",
            str(tmp_path),
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [
            sys.executable,
            str(REPO / "generate.py"),
            "--prompt",
            "the quick brown",
            "--max_new_tokens",
            "8",
            "--checkpoint_path",
            str(tmp_path / "lit-llama.pth"),
            "--tokenizer_path",
            str(tmp_path / "tokenizer.model"),
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert r.returncode == 0, r.stderr
    assert "tokens/sec" in r.stderr
    assert r.stdout.strip()  # decoded sample on stdout
