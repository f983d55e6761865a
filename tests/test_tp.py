"""shard_map tensor parallelism: local-shard forward == single-device forward
(runs on the virtual 8-device CPU mesh; on TPU the same path feeds the Pallas
kernels local shapes — SURVEY.md §2.8 goes beyond the reference here, which has
no runtime TP at all)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lit_llama_tpu import LLaMAConfig, forward, init_kv_cache, init_params
from lit_llama_tpu.models import llama
from lit_llama_tpu.parallel import mesh as mesh_lib, tp


@pytest.fixture(scope="module")
def setup():
    cfg = LLaMAConfig(block_size=64, vocab_size=96, n_layer=2, n_head=4, n_embd=64)
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


@pytest.mark.parametrize("mp", [2, 4])
def test_tp_decode_matches_single_device(setup, mp):
    if len(jax.devices()) < mp:
        pytest.skip("not enough devices")
    cfg, params = setup
    mesh = mesh_lib.make_mesh(data=1, model=mp, devices=jax.devices()[:mp])

    S = 16
    toks = jnp.arange(6, dtype=jnp.int32)[None, :] + 1

    # single-device reference: prefill then 2 decode steps
    cache_ref = init_kv_cache(cfg, 1, S)
    ref_logits, cache_ref = forward(
        params, toks, cfg, input_pos=jnp.arange(6), kv_cache=cache_ref
    )
    step_tok = jnp.array([[7]], jnp.int32)
    ref_step, cache_ref = forward(
        params, step_tok, cfg, input_pos=jnp.array([6]), kv_cache=cache_ref
    )

    up = llama.unstack_layers(params)
    sp = tp.shard_params_tp(up, mesh, cfg)
    cache = tp.init_tp_cache(cfg, mesh, 1, S)
    prefill, decode = tp.make_tp_forward(cfg, mesh, sp)

    got_logits, cache = prefill(sp, toks, jnp.arange(6), cache)
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), atol=2e-4, rtol=2e-4
    )
    got_step, cache = decode(sp, step_tok, jnp.array([6]), cache)
    np.testing.assert_allclose(
        np.asarray(got_step), np.asarray(ref_step), atol=2e-4, rtol=2e-4
    )


def test_tp_quantized_decode_matches_replicated(setup):
    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    cfg, params = setup
    qcfg = cfg.replace(quantize="int4", quant_groupsize=16)
    qparams = llama.quantize_params(
        jax.tree_util.tree_map(lambda a: a, params), qcfg
    )
    mesh = mesh_lib.make_mesh(data=1, model=2, devices=jax.devices()[:2])

    S = 12
    toks = jnp.arange(5, dtype=jnp.int32)[None, :] + 1
    cache_ref = init_kv_cache(qcfg, 1, S)
    ref_logits, _ = forward(
        qparams, toks, qcfg, input_pos=jnp.arange(5), kv_cache=cache_ref
    )

    up = llama.unstack_layers(qparams)
    sp = tp.shard_params_tp(up, mesh, qcfg)
    cache = tp.init_tp_cache(qcfg, mesh, 1, S)
    prefill, _ = tp.make_tp_forward(qcfg, mesh, sp)
    got, _ = prefill(sp, toks, jnp.arange(5), cache)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref_logits), atol=2e-4, rtol=2e-4
    )


def test_tp_slot_pos_decode(setup):
    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    cfg, params = setup
    mesh = mesh_lib.make_mesh(data=1, model=2, devices=jax.devices()[:2])
    S = 16
    B = 2
    up = llama.unstack_layers(params)
    sp = tp.shard_params_tp(up, mesh, cfg)
    cache = tp.init_tp_cache(cfg, mesh, B, S)
    _, decode = tp.make_tp_forward(cfg, mesh, sp)

    toks = jnp.array([[3], [5]], jnp.int32)
    spos = jnp.array([0, 4], jnp.int32)
    got, new_cache = decode(sp, toks, spos, cache)

    # reference: per-slot single-device decode with the slot_pos path
    cache_ref = init_kv_cache(cfg, B, S)
    ref, _ = forward(params, toks, cfg, slot_pos=spos, kv_cache=cache_ref)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4)


def _add_nonzero_lora(params, cfg, key):
    """init LoRA then give lora_b nonzero values so the update actually matters."""
    from lit_llama_tpu.peft import lora as lora_mod

    params = jax.tree_util.tree_map(lambda a: a, params)
    params = lora_mod.add_lora_params(params, cfg, key)
    ca = params["h"]["attn"]["c_attn"]
    ca["lora_b"] = (
        jax.random.normal(jax.random.PRNGKey(9), ca["lora_b"].shape) * 0.05
    ).astype(ca["lora_b"].dtype)
    return params


@pytest.mark.parametrize("mp", [2, 4])
def test_tp_lora_matches_single_device(setup, mp):
    """LoRA under shard_map TP (VERDICT r4 next #6): lora_b shards with the
    q/v head columns; prefill + slot decode match the replicated forward."""
    from lit_llama_tpu.models.config import LoRAConfig

    if len(jax.devices()) < mp:
        pytest.skip("not enough devices")
    cfg, params = setup
    lcfg = cfg.replace(lora=LoRAConfig(r=4, alpha=8.0, dropout=0.0))
    lparams = _add_nonzero_lora(params, lcfg, jax.random.PRNGKey(3))
    mesh = mesh_lib.make_mesh(data=1, model=mp, devices=jax.devices()[:mp])

    S = 16
    toks = jnp.arange(6, dtype=jnp.int32)[None, :] + 1
    cache_ref = init_kv_cache(lcfg, 1, S)
    ref_logits, cache_ref = forward(
        lparams, toks, lcfg, input_pos=jnp.arange(6), kv_cache=cache_ref
    )
    step_tok = jnp.array([[7]], jnp.int32)
    ref_step, _ = forward(
        lparams, step_tok, lcfg, input_pos=jnp.array([6]), kv_cache=cache_ref
    )

    up = llama.unstack_layers(lparams)
    sp = tp.shard_params_tp(up, mesh, lcfg)
    cache = tp.init_tp_cache(lcfg, mesh, 1, S)
    prefill, decode = tp.make_tp_forward(lcfg, mesh, sp)
    got, cache = prefill(sp, toks, jnp.arange(6), cache)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref_logits), atol=2e-4, rtol=2e-4
    )
    got_step, _ = decode(sp, step_tok, jnp.array([6]), cache)
    np.testing.assert_allclose(
        np.asarray(got_step), np.asarray(ref_step), atol=2e-4, rtol=2e-4
    )
    # the lora update must actually be in play: zeroing lora_b changes logits
    base_cache = init_kv_cache(cfg, 1, S)
    base_logits, _ = forward(
        params, toks, cfg, input_pos=jnp.arange(6), kv_cache=base_cache
    )
    assert not np.allclose(np.asarray(got), np.asarray(base_logits), atol=1e-3)


def test_tp_lora_quantized_base(setup):
    """North-star composition: int4 base + dense LoRA overlay under TP."""
    from lit_llama_tpu.models.config import LoRAConfig

    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    cfg, params = setup
    qcfg = cfg.replace(
        quantize="int4", quant_groupsize=16,
        lora=LoRAConfig(r=4, alpha=8.0, dropout=0.0),
    )
    qparams = llama.quantize_params(
        jax.tree_util.tree_map(lambda a: a, params), qcfg
    )
    qparams = _add_nonzero_lora(qparams, qcfg, jax.random.PRNGKey(3))
    mesh = mesh_lib.make_mesh(data=1, model=2, devices=jax.devices()[:2])

    S = 12
    toks = jnp.arange(5, dtype=jnp.int32)[None, :] + 1
    cache_ref = init_kv_cache(qcfg, 1, S)
    ref_logits, _ = forward(
        qparams, toks, qcfg, input_pos=jnp.arange(5), kv_cache=cache_ref
    )
    up = llama.unstack_layers(qparams)
    sp = tp.shard_params_tp(up, mesh, qcfg)
    cache = tp.init_tp_cache(qcfg, mesh, 1, S)
    prefill, _ = tp.make_tp_forward(qcfg, mesh, sp)
    got, _ = prefill(sp, toks, jnp.arange(5), cache)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref_logits), atol=2e-4, rtol=2e-4
    )


def test_generate_tp_lora_greedy_matches_single_device(setup):
    """End-to-end generate_tp (generate/lora.py --model_parallel 2 path) vs
    the single-device whole-loop generate, greedy."""
    from lit_llama_tpu.models.config import LoRAConfig
    from lit_llama_tpu.models.generate import generate

    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    cfg, params = setup
    lcfg = cfg.replace(lora=LoRAConfig(r=4, alpha=8.0, dropout=0.0))
    lparams = _add_nonzero_lora(params, lcfg, jax.random.PRNGKey(3))
    prompt = np.arange(5, dtype=np.int32) + 1

    ref = generate(
        llama.unstack_layers(lparams), prompt, 8, config=lcfg,
        temperature=0.0, key=jax.random.PRNGKey(0),
    )

    mesh = mesh_lib.make_mesh(data=1, model=2, devices=jax.devices()[:2])
    sp = tp.shard_params_tp(llama.unstack_layers(lparams), mesh, lcfg)
    got = tp.generate_tp(
        sp, prompt, 8, config=lcfg, mesh=mesh, temperature=0.0,
        key=jax.random.PRNGKey(0),
    )
    np.testing.assert_array_equal(got, ref)
