"""LLaMA-Adapter v1 (prefix cross-attention) and v2 (linear bias/scale).

Reference semantics being matched (lit_llama/adapter.py:55-190, adapter_v2.py:11-48):
* per-block learnable prompt ``adapter_wte`` of ``prompt_length`` (10) tokens and a
  zero-init per-head ``gating_factor``, active from ``adapter_start_layer`` (2) up;
* the prefix goes through the block's own ``c_attn``; only the k/v thirds are
  used; NO RoPE on the prefix keys (adapter.py:155-160);
* cross-attention q×(ak, av) with an all-ones mask, summed into the self-attention
  output scaled by the gate (adapter.py:162-167);
* v2 adds a learnable (bias, scale) around every linear — applied inside
  ops/linear.py — and makes the RMSNorm weights trainable.

Stacked-layer layout: ``adapter_wte`` (L, aT, D), ``gating`` (L, H), plus a
non-trainable 0/1 ``adapter_active`` (L, 1) baking in the start-layer cutoff so
the scanned block stays uniform across layers.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from lit_llama_tpu.models.config import LLaMAConfig
from lit_llama_tpu.ops.linear import linear

Params = Dict[str, Any]


def add_adapter_params(params: Params, config: LLaMAConfig) -> Params:
    cfg = config.adapter
    L, D, H = config.n_layer, config.n_embd, config.n_head
    dtype = jnp.dtype(config.param_dtype)
    h = params["h"]
    # normal(0, 0.02) like other embeddings; gate zero-init (adapter.py:74-79)
    h["adapter_wte"] = (
        jax.random.normal(jax.random.PRNGKey(7), (L, cfg.prompt_length, D)) * 0.02
    ).astype(dtype)
    h["gating"] = jnp.zeros((L, H), dtype)
    h["adapter_active"] = (
        jnp.arange(L, dtype=jnp.float32) >= cfg.start_layer
    ).astype(dtype)[:, None]
    if cfg.v2:
        _add_v2(params, config)
    return params


def _add_v2(params: Params, config: LLaMAConfig) -> None:
    """Learnable bias/scale on every linear (adapter_v2.py:36-48)."""
    L, D, I, V = (
        config.n_layer,
        config.n_embd,
        config.intermediate_size,
        config.padded_vocab_size,
    )
    dtype = jnp.dtype(config.param_dtype)
    h = params["h"]

    def stack(d, out_dim):
        d["av2_bias"] = jnp.zeros((L, 1, out_dim), dtype)
        d["av2_scale"] = jnp.ones((L, 1, out_dim), dtype)

    stack(h["attn"]["c_attn"], 3 * D)
    stack(h["attn"]["c_proj"], D)
    stack(h["mlp"]["c_fc1"], I)
    stack(h["mlp"]["c_fc2"], I)
    stack(h["mlp"]["c_proj"], D)
    params["lm_head"]["av2_bias"] = jnp.zeros((1, V), dtype)
    params["lm_head"]["av2_scale"] = jnp.ones((1, V), dtype)


def init_adapter_cache(config: LLaMAConfig, batch_size: int, dtype) -> Params:
    """The adapter k/v are a pure function of fixed weights — recomputed per call
    (aT=10 rows through c_attn, negligible) instead of cached state. No extra
    decode-state entries needed."""
    return {}


def prefix_attention(
    layer_params: Params,
    q: jnp.ndarray,  # (B, H, T, hs)
    y: jnp.ndarray,  # (B, H, T, hs) self-attention output
    config: LLaMAConfig,
    kv: Optional[Params],
    write_pos,
) -> Tuple[jnp.ndarray, Optional[Params]]:
    """y + gate * softmax(q·akᵀ/√hs)·av (reference: adapter.py:151-167)."""
    B, H, T, hs = q.shape
    aT = config.adapter.prompt_length
    prefix = layer_params["adapter_wte"][None]  # (1, aT, D)
    akv = linear(layer_params["attn"]["c_attn"], prefix.astype(q.dtype))
    _, ak, av = jnp.split(akv, 3, axis=-1)
    ak = ak.reshape(1, aT, H, hs).transpose(0, 2, 1, 3)  # (1, H, aT, hs)
    av = av.reshape(1, aT, H, hs).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhts,bhas->bhta", q, ak)
    scores = scores.astype(jnp.float32) / jnp.sqrt(jnp.float32(hs))
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    ay = jnp.einsum("bhta,bhas->bhts", probs, av)
    gate = layer_params["gating"][None, :, None, None].astype(q.dtype)
    active = layer_params["adapter_active"][0].astype(q.dtype)  # (1,) -> scalar
    y = y + active * gate * ay
    return y, kv


def trainable_mask(params: Params, v2: bool = False) -> Params:
    """v1: adapter_wte + gating (adapter.py:307-311); v2 adds av2_* and the
    RMSNorm weights (adapter_v2.py:11-21). adapter_active stays frozen."""

    def f(path, leaf):
        keys = [str(k.key) if hasattr(k, "key") else str(k) for k in path]
        if "adapter_active" in keys:
            return False
        if any(k in ("adapter_wte", "gating") for k in keys):
            return True
        if v2 and any(
            k.startswith("av2_") or k in ("rms_1", "rms_2", "ln_f") for k in keys
        ):
            return True
        return False

    return jax.tree_util.tree_map_with_path(f, params)


def adapter_state(params: Params, v2: bool = False) -> Params:
    """Adapter-only sub-pytree for checkpoints (reference:
    adapter_state_from_state_dict adapter.py:313-315, v2 adapter_v2.py:24-27)."""
    mask = trainable_mask(params, v2)

    def prune(p, m):
        if isinstance(p, dict):
            out = {}
            for k, v in p.items():
                sub = prune(v, m[k])
                if sub is not None:
                    out[k] = sub
            return out or None
        return p if m else None

    return prune(params, mask) or {}


def load_adapter_state(params: Params, state: Params) -> Params:
    """Overlay an adapter checkpoint onto base params (generate/adapter.py:64-73)."""
    out = jax.tree_util.tree_map(lambda x: x, params)

    def overlay(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                overlay(dst[k], v)
            else:
                dst[k] = v

    overlay(out, state)
    return out
