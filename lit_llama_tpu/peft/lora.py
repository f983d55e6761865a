"""LoRA on the fused QKV projection, reproducing the reference's merged-linear
semantics (reference: lit_llama/lora.py:59-326).

Reference behavior being matched:
* low-rank update only on the fused ``c_attn`` linear, with per-group enabling
  ``enable_lora=[True, False, True]`` — Q and V get updates, K does not
  (lora.py:436);
* ``lora_A``: one (r, in) block per enabled group stacked to (Σenable·r, in);
  ``lora_B``: per-group (out_group, r) applied group-wise (the reference uses a
  grouped conv1d, lora.py:320-325) — here a per-group einsum;
* the combined update is zero-padded into the q/v slots of the (3·D) output
  (``zero_pad``, lora.py:205-241);
* scaling = alpha / r (lora.py:171);
* merge/unmerge for export and for inference at zero overhead (lora.py:243-280);
* trainability filter / adapter-only state dict (lora.py:329-395).

Storage layout (ours is (in, out), layers stacked on leading L):
  lora_a: (L, D, n_enabled·r)      lora_b: (L, n_enabled, r, D)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from lit_llama_tpu.models.config import LLaMAConfig, LoRAConfig
from lit_llama_tpu.ops.linear import dequantize_int4, dequantize_int8

Params = Dict[str, Any]


def add_lora_params(params: Params, config: LLaMAConfig, key: jax.Array) -> Params:
    """Attach LoRA A/B to the stacked c_attn params.

    A is kaiming-uniform initialized, B zero — the update starts at zero
    (reference: lora.py:190-195).
    """
    cfg = config.lora
    n_en = sum(cfg.enable)
    L, D, r = config.n_layer, config.n_embd, cfg.r
    # kaiming uniform a=sqrt(5) over fan_in=D: bound = sqrt(6 / ((1 + 5) / 2 / ... )
    # = 1/sqrt(D) (matches torch's kaiming_uniform_(a=math.sqrt(5)))
    bound = 1.0 / jnp.sqrt(D)
    dtype = jnp.dtype(config.param_dtype)
    a = jax.random.uniform(key, (L, D, n_en * r), jnp.float32, -bound, bound)
    params["h"]["attn"]["c_attn"]["lora_a"] = a.astype(dtype)
    params["h"]["attn"]["c_attn"]["lora_b"] = jnp.zeros((L, n_en, r, D), dtype)
    return params


def lora_delta(
    attn_params: Params,
    x: jnp.ndarray,
    cfg: LoRAConfig,
    dropout_key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """The low-rank QKV update, zero-scattered into disabled groups.

    x: (B, T, D) -> (B, T, 3D). Dropout on x during training only
    (reference: lora.py:297,322).
    """
    if dropout_key is not None and cfg.dropout > 0.0:
        keep = 1.0 - cfg.dropout
        mask = jax.random.bernoulli(dropout_key, keep, x.shape)
        x = jnp.where(mask, x / keep, 0.0).astype(x.dtype)
    a = attn_params["lora_a"].astype(x.dtype)
    b = attn_params["lora_b"].astype(x.dtype)
    n_en, r = b.shape[-3], b.shape[-2]
    B, T, D = x.shape
    ax = (x @ a).reshape(B, T, n_en, r)
    # per-enabled-group rank-r expansion (the reference's grouped conv1d).
    # Under shard_map TP lora_b holds only this device's head columns
    # (D/mp wide) while x/lora_a stay replicated — the group width therefore
    # comes from b, not from x, and the padded update matches the local qkv.
    delta = jnp.einsum("btgr,grd->btgd", ax, b) * cfg.scaling
    return _zero_pad(delta, cfg, delta.shape[-1])


def _zero_pad(delta: jnp.ndarray, cfg: LoRAConfig, D: int) -> jnp.ndarray:
    """Scatter per-group updates into the enabled q/k/v slots of (..., 3D)
    (reference: lora.py:205-241)."""
    B, T = delta.shape[:2]
    out = []
    g = 0
    for enabled in cfg.enable:
        if enabled:
            out.append(delta[:, :, g])
            g += 1
        else:
            out.append(jnp.zeros((B, T, D), delta.dtype))
    return jnp.concatenate(out, axis=-1)


def merge_lora(params: Params, config: LLaMAConfig) -> Params:
    """Fold the LoRA update into the dense c_attn weight and drop A/B
    (reference merge-on-eval, lora.py:243-266; export flow,
    scripts/convert_lora_weights.py:35-91). Requires a dense base weight."""
    cfg = config.lora
    attn = dict(params["h"]["attn"])
    c_attn = dict(attn["c_attn"])
    if "w" not in c_attn:
        raise ValueError("merge_lora needs a dense base weight (not quantized)")
    w = c_attn["w"]
    a = c_attn.pop("lora_a").astype(jnp.float32)
    b = c_attn.pop("lora_b").astype(jnp.float32)
    L, D, _ = a.shape
    n_en, r = b.shape[-3], b.shape[-2]
    # (L, D_in, g, r) x (L, g, r, D_out) -> (L, D_in, g, D_out)
    ab = jnp.einsum("ligr,lgro->ligo", a.reshape(L, D, n_en, r), b)
    delta = ab * cfg.scaling
    cols = []
    g = 0
    for enabled in cfg.enable:
        if enabled:
            cols.append(delta[:, :, g])
            g += 1
        else:
            cols.append(jnp.zeros((L, D, D), jnp.float32))
    full = jnp.concatenate(cols, axis=-1)  # (L, D, 3D)
    c_attn["w"] = (w.astype(jnp.float32) + full).astype(w.dtype)
    attn["c_attn"] = c_attn
    out = dict(params)
    out["h"] = dict(params["h"])
    out["h"]["attn"] = attn
    return out


def trainable_mask(params: Params) -> Params:
    """True only for lora_* leaves (reference: mark_only_lora_as_trainable,
    lora.py:329-345; bias policy is moot — LLaMA linears have no biases)."""

    def f(path, leaf):
        keys = [k.key if hasattr(k, "key") else str(k) for k in path]
        return any(str(k).startswith("lora_") for k in keys)

    return jax.tree_util.tree_map_with_path(f, params)


def lora_state(params: Params) -> Params:
    """Sub-pytree of LoRA-only weights for adapter checkpoints
    (reference: lora_state_dict, lora.py:364-395)."""
    c_attn = params["h"]["attn"]["c_attn"]
    return {
        "h": {
            "attn": {
                "c_attn": {
                    "lora_a": c_attn["lora_a"],
                    "lora_b": c_attn["lora_b"],
                }
            }
        }
    }


def load_lora_state(params: Params, lora_params: Params) -> Params:
    """Overlay a LoRA-only checkpoint onto base params (the two-stage load in
    generate/lora.py:72-82)."""
    out = jax.tree_util.tree_map(lambda x: x, params)
    out["h"]["attn"]["c_attn"].update(lora_params["h"]["attn"]["c_attn"])
    return out
