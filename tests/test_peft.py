"""PEFT behavior tests (mirrors the reference's LoRA/adapter unit strategy:
tests/test_lora.py:24-66, tests/test_adapter.py:9-57)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lit_llama_tpu import LLaMAConfig, forward, init_params
from lit_llama_tpu.models.config import AdapterConfig, LoRAConfig
from lit_llama_tpu.peft import adapter as adapter_mod
from lit_llama_tpu.peft import lora as lora_mod


@pytest.fixture
def cfg():
    return LLaMAConfig(block_size=32, vocab_size=64, n_layer=2, n_head=4, n_embd=32)


def tokens(B=2, T=8):
    return jnp.arange(B * T, dtype=jnp.int32).reshape(B, T) % 64


def test_lora_zero_init_is_identity(cfg):
    base = init_params(cfg, jax.random.PRNGKey(0))
    ref_logits, _ = forward(base, tokens(), cfg)
    lcfg = cfg.replace(lora=LoRAConfig(r=4, alpha=8.0, dropout=0.0))
    lparams = init_params(lcfg, jax.random.PRNGKey(0))
    # same base weights, lora_b == 0 -> identical logits (reference: lora_B
    # zero-init means the update starts at zero, lora.py:190-195)
    got, _ = forward(lparams, tokens(), lcfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_logits), atol=1e-6)


def test_lora_merge_matches_runtime_delta(cfg):
    lcfg = cfg.replace(lora=LoRAConfig(r=4, alpha=8.0, dropout=0.0))
    params = init_params(lcfg, jax.random.PRNGKey(0))
    # make the update non-trivial
    key = jax.random.PRNGKey(42)
    params["h"]["attn"]["c_attn"]["lora_b"] = (
        jax.random.normal(key, params["h"]["attn"]["c_attn"]["lora_b"].shape) * 0.1
    )
    runtime, _ = forward(params, tokens(), lcfg)
    merged = lora_mod.merge_lora(params, lcfg)
    assert "lora_a" not in merged["h"]["attn"]["c_attn"]
    merged_logits, _ = forward(merged, tokens(), cfg)
    np.testing.assert_allclose(
        np.asarray(merged_logits), np.asarray(runtime), atol=1e-4, rtol=1e-4
    )


def test_lora_k_group_gets_no_update(cfg):
    """enable_lora=[True, False, True]: the K slice of the QKV update is zero
    (reference: lora.py:436 + zero_pad lora.py:205-241)."""
    lcfg = cfg.replace(lora=LoRAConfig(r=4, alpha=8.0, dropout=0.0))
    params = init_params(lcfg, jax.random.PRNGKey(0))
    c_attn = params["h"]["attn"]["c_attn"]
    c_attn["lora_b"] = jnp.ones_like(c_attn["lora_b"])
    x = jnp.ones((1, 3, cfg.n_embd), jnp.float32)
    delta = lora_mod.lora_delta(
        jax.tree_util.tree_map(lambda a: a[0], c_attn), x, lcfg.lora
    )
    D = cfg.n_embd
    q_part, k_part, v_part = np.split(np.asarray(delta), 3, axis=-1)
    assert np.abs(q_part).sum() > 0
    assert np.abs(v_part).sum() > 0
    np.testing.assert_array_equal(k_part, 0)


def test_lora_trainable_mask_and_state(cfg):
    lcfg = cfg.replace(lora=LoRAConfig(r=4))
    params = init_params(lcfg, jax.random.PRNGKey(0))
    mask = lora_mod.trainable_mask(params)
    flat, _ = jax.tree_util.tree_flatten_with_path(mask)
    trainables = [p for p, v in flat if v]
    assert len(trainables) == 2  # lora_a, lora_b only
    state = lora_mod.lora_state(params)
    leaves = jax.tree_util.tree_leaves(state)
    assert len(leaves) == 2
    # round-trip through overlay
    params2 = lora_mod.load_lora_state(params, state)
    np.testing.assert_array_equal(
        np.asarray(params2["h"]["attn"]["c_attn"]["lora_a"]),
        np.asarray(params["h"]["attn"]["c_attn"]["lora_a"]),
    )


def test_adapter_zero_gate_is_identity(cfg):
    base = init_params(cfg, jax.random.PRNGKey(0))
    ref_logits, _ = forward(base, tokens(), cfg)
    acfg = cfg.replace(adapter=AdapterConfig(prompt_length=4, start_layer=1))
    aparams = init_params(acfg, jax.random.PRNGKey(0))
    got, _ = forward(aparams, tokens(), acfg)
    # gating_factor zero-init -> adapter contributes nothing (adapter.py:74-79)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_logits), atol=1e-6)


def test_adapter_gate_changes_output_only_from_start_layer(cfg):
    acfg = cfg.replace(adapter=AdapterConfig(prompt_length=4, start_layer=1))
    params = init_params(acfg, jax.random.PRNGKey(0))
    ref, _ = forward(params, tokens(), acfg)
    # opening the gate on layer 0 (inactive, below start_layer) changes nothing
    params["h"]["gating"] = params["h"]["gating"].at[0].set(1.0)
    got, _ = forward(params, tokens(), acfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
    # opening layer 1 (active) changes the logits
    params["h"]["gating"] = params["h"]["gating"].at[1].set(1.0)
    got2, _ = forward(params, tokens(), acfg)
    assert np.abs(np.asarray(got2) - np.asarray(ref)).max() > 1e-4


def test_adapter_v2_init_is_identity_and_trainables(cfg):
    base = init_params(cfg, jax.random.PRNGKey(0))
    ref_logits, _ = forward(base, tokens(), cfg)
    acfg = cfg.replace(adapter=AdapterConfig(prompt_length=4, start_layer=1, v2=True))
    aparams = init_params(acfg, jax.random.PRNGKey(0))
    got, _ = forward(aparams, tokens(), acfg)
    # scale=1, bias=0 at init (adapter_v2.py:36-38)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_logits), atol=1e-6)

    mask = adapter_mod.trainable_mask(aparams, v2=True)
    flat, _ = jax.tree_util.tree_flatten_with_path(mask)
    names = {"/".join(str(getattr(k, "key", k)) for k in p) for p, v in flat if v}
    # adapter v1 params + all av2 pairs + norms are trainable (adapter_v2.py:11-21)
    assert any("av2_scale" in n for n in names)
    assert any("rms_1" in n for n in names)
    assert "ln_f" in names
    assert not any("c_attn/w" in n for n in names)


def test_adapter_state_roundtrip(cfg):
    acfg = cfg.replace(adapter=AdapterConfig(prompt_length=4, start_layer=1, v2=True))
    params = init_params(acfg, jax.random.PRNGKey(0))
    state = adapter_mod.adapter_state(params, v2=True)
    leaves = jax.tree_util.tree_leaves(state)
    assert 0 < len(leaves) < len(jax.tree_util.tree_leaves(params))
    params2 = adapter_mod.load_adapter_state(params, state)
    got = params2["h"]["adapter_wte"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(params["h"]["adapter_wte"]))


def test_adapter_decode_matches_full_forward(cfg):
    """Adapter path in decode (kv-cache) equals the no-cache forward."""
    from lit_llama_tpu.models import llama

    acfg = cfg.replace(adapter=AdapterConfig(prompt_length=4, start_layer=1))
    params = init_params(acfg, jax.random.PRNGKey(0))
    params["h"]["gating"] = jnp.ones_like(params["h"]["gating"]) * 0.5
    toks = tokens(1, 8)
    full_logits, _ = forward(params, toks, acfg)
    cache = llama.init_kv_cache(acfg, 1, 8, jnp.float32)
    logits_p, cache = forward(
        params, toks[:, :4], acfg, input_pos=jnp.arange(4), kv_cache=cache
    )
    outs = [logits_p[:, -1]]
    for t in range(4, 8):
        logits_t, cache = forward(
            params, toks[:, t : t + 1], acfg, input_pos=jnp.array([t]), kv_cache=cache
        )
        outs.append(logits_t[:, -1])
    np.testing.assert_allclose(
        np.asarray(jnp.stack(outs, 1)),
        np.asarray(full_logits[:, 3:8]),
        atol=2e-5,
        rtol=2e-5,
    )
