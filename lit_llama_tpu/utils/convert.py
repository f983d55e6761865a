"""Checkpoint layout conversion: lit-llama / Meta / HF state dicts -> our pytree.

Mirrors the reference converters' key maps exactly so any checkpoint the reference
can ingest, we can too:
  * lit-llama names (``transformer.h.{i}.attn.c_attn.weight`` ...) — native format of
    reference checkpoints (lit_llama/model.py:51-68).
  * Meta names (``layers.{i}.attention.wq.weight`` ...) with multi-shard TP merging
    (reference: scripts/convert_checkpoint.py:22-137).
  * HF names (``model.layers.{i}.self_attn.q_proj.weight`` ...) with the rotary q/k
    un-permutation and QKV fusion (reference: scripts/convert_hf_checkpoint.py:63-135).

Our pytree differs from all three on purpose (TPU-first):
  * linear weights are transposed to (in_features, out_features) so forwards are
    ``x @ w`` in the MXU-natural orientation;
  * per-layer tensors are stacked on a leading layer axis for lax.scan.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional

import numpy as np

from lit_llama_tpu.models.config import LLaMAConfig

Array = Any  # numpy array or LazyTensor


def _materialize(t) -> np.ndarray:
    return t.numpy() if hasattr(t, "numpy") else np.asarray(t)


def hf_permute_back(w: np.ndarray, n_head: int) -> np.ndarray:
    """Reverse HF's rotary q/k permutation: half-split layout -> Meta interleaved
    (reference: scripts/convert_hf_checkpoint.py:63-70). ``w``: (dim, dim) torch
    orientation (out, in)."""
    dim_out, dim_in = w.shape
    return (
        w.reshape(n_head, 2, dim_out // n_head // 2, dim_in)
        .transpose(0, 2, 1, 3)
        .reshape(dim_out, dim_in)
    )


def hf_to_lit(sd: Mapping[str, Array], config: LLaMAConfig) -> Dict[str, np.ndarray]:
    """HF LLaMA state dict -> lit-llama key names (torch orientation), fusing QKV
    (reference: scripts/convert_hf_checkpoint.py:72-135)."""
    out: Dict[str, np.ndarray] = {}
    per_layer = {
        "self_attn.o_proj.weight": "attn.c_proj.weight",
        "mlp.gate_proj.weight": "mlp.c_fc1.weight",
        "mlp.up_proj.weight": "mlp.c_fc2.weight",
        "mlp.down_proj.weight": "mlp.c_proj.weight",
        "input_layernorm.weight": "rms_1.scale",
        "post_attention_layernorm.weight": "rms_2.scale",
    }
    top = {
        "model.embed_tokens.weight": "transformer.wte.weight",
        "model.norm.weight": "transformer.ln_f.scale",
        "lm_head.weight": "lm_head.weight",
    }
    qkv: Dict[int, Dict[str, np.ndarray]] = {}
    for name, tensor in sd.items():
        if "rotary_emb.inv_freq" in name:
            continue
        if name in top:
            out[top[name]] = _materialize(tensor)
            continue
        if not name.startswith("model.layers."):
            continue
        layer = int(name.split(".")[2])
        sub = ".".join(name.split(".")[3:])
        if sub in ("self_attn.q_proj.weight", "self_attn.k_proj.weight", "self_attn.v_proj.weight"):
            qkv.setdefault(layer, {})[sub.split(".")[1]] = _materialize(tensor)
            continue
        out[f"transformer.h.{layer}.{per_layer[sub]}"] = _materialize(tensor)
    for layer, parts in qkv.items():
        q = hf_permute_back(parts["q_proj"], config.n_head)
        k = hf_permute_back(parts["k_proj"], config.n_head)
        v = parts["v_proj"]
        out[f"transformer.h.{layer}.attn.c_attn.weight"] = np.concatenate([q, k, v], axis=0)
    return out


def meta_to_lit(
    shards: list, config: LLaMAConfig, dtype=np.float32
) -> Dict[str, np.ndarray]:
    """Meta ``consolidated.*.pth`` shard dicts -> lit-llama names, merging TP shards
    (reference: scripts/convert_checkpoint.py:22-137). ``shards``: list of state
    dicts in Meta key names, in rank order."""
    key_map = {
        "tok_embeddings.weight": ("transformer.wte.weight", 1),
        "output.weight": ("lm_head.weight", 0),
        "norm.weight": ("transformer.ln_f.scale", None),
    }
    layer_map = {
        "attention.wq.weight": ("attn.wq", 0),
        "attention.wk.weight": ("attn.wk", 0),
        "attention.wv.weight": ("attn.wv", 0),
        "attention.wo.weight": ("attn.c_proj.weight", 1),
        "feed_forward.w1.weight": ("mlp.c_fc1.weight", 0),
        "feed_forward.w2.weight": ("mlp.c_proj.weight", 1),
        "feed_forward.w3.weight": ("mlp.c_fc2.weight", 0),
        "attention_norm.weight": ("rms_1.scale", None),
        "ffn_norm.weight": ("rms_2.scale", None),
    }
    merged: Dict[str, list] = {}
    for shard in shards:
        for name, tensor in shard.items():
            if name in key_map:
                to_name, dim = key_map[name]
            elif name.startswith("layers."):
                layer = name.split(".")[1]
                sub = ".".join(name.split(".")[2:])
                if sub not in layer_map:
                    continue
                to_sub, dim = layer_map[sub]
                to_name = f"transformer.h.{layer}.{to_sub}"
            else:
                continue
            arr = _materialize(tensor).astype(dtype)
            if dim is None:
                merged[to_name] = [arr]  # replicated across shards
            else:
                merged.setdefault(to_name, []).append((arr, dim))
    out: Dict[str, np.ndarray] = {}
    wqkv: Dict[str, Dict[str, np.ndarray]] = {}
    for name, parts in merged.items():
        if isinstance(parts[0], tuple):
            arrs = [p[0] for p in parts]
            dim = parts[0][1]
            arr = np.concatenate(arrs, axis=dim) if len(arrs) > 1 else arrs[0]
        else:
            arr = parts[0]
        if ".attn.w" in name:
            base, which = name.rsplit(".", 1)  # ...attn, wq|wk|wv
            wqkv.setdefault(base, {})[which] = arr
        else:
            out[name] = arr
    for base, parts in wqkv.items():
        # Concatenating per-shard wq/wk/wv chunks along dim 0 then stacking q,k,v
        # reproduces the reference's re-interleaving (convert_checkpoint.py:119-135).
        out[base.replace(".attn", ".attn.c_attn.weight")] = np.concatenate(
            [parts["wq"], parts["wk"], parts["wv"]], axis=0
        )
    return out


# ---------------------------------------------------------------------------
# lit-llama flat state dict  <->  our stacked pytree
# ---------------------------------------------------------------------------

_LINEARS = {
    "attn.c_attn": ("h", "attn", "c_attn"),
    "attn.c_proj": ("h", "attn", "c_proj"),
    "mlp.c_fc1": ("h", "mlp", "c_fc1"),
    "mlp.c_fc2": ("h", "mlp", "c_fc2"),
    "mlp.c_proj": ("h", "mlp", "c_proj"),
}


def lit_to_pytree(
    sd: Mapping[str, Array], config: LLaMAConfig, dtype=None
) -> Dict[str, Any]:
    """lit-llama-named flat state dict (torch orientation) -> our stacked pytree.

    Linear weights transpose (out,in)->(in,out); per-layer tensors stack on axis 0.
    The embedding/lm_head are zero-padded up to padded_vocab_size if the checkpoint
    stores the raw vocab (reference pads at init, model.py:34-36).
    """
    import jax.numpy as jnp

    dtype = jnp.dtype(dtype or config.param_dtype)
    L = config.n_layer

    def get(name: str) -> np.ndarray:
        t = _materialize(sd[name])
        return t

    def pad_vocab(arr: np.ndarray) -> np.ndarray:
        V = config.padded_vocab_size
        if arr.shape[0] < V:
            arr = np.concatenate(
                [arr, np.zeros((V - arr.shape[0],) + arr.shape[1:], arr.dtype)], axis=0
            )
        return arr

    params: Dict[str, Any] = {
        "wte": jnp.asarray(pad_vocab(get("transformer.wte.weight")), dtype),
        "ln_f": jnp.asarray(get("transformer.ln_f.scale"), dtype),
        "lm_head": {"w": jnp.asarray(pad_vocab(get("lm_head.weight")).T, dtype)},
        "h": {
            "rms_1": jnp.asarray(
                np.stack([get(f"transformer.h.{i}.rms_1.scale") for i in range(L)]), dtype
            ),
            "rms_2": jnp.asarray(
                np.stack([get(f"transformer.h.{i}.rms_2.scale") for i in range(L)]), dtype
            ),
            "attn": {
                "c_attn": {
                    "w": jnp.asarray(
                        np.stack(
                            [get(f"transformer.h.{i}.attn.c_attn.weight").T for i in range(L)]
                        ),
                        dtype,
                    )
                },
                "c_proj": {
                    "w": jnp.asarray(
                        np.stack(
                            [get(f"transformer.h.{i}.attn.c_proj.weight").T for i in range(L)]
                        ),
                        dtype,
                    )
                },
            },
            "mlp": {
                name: {
                    "w": jnp.asarray(
                        np.stack(
                            [get(f"transformer.h.{i}.mlp.{name}.weight").T for i in range(L)]
                        ),
                        dtype,
                    )
                }
                for name in ("c_fc1", "c_fc2", "c_proj")
            },
        },
    }
    return params


# ---------------------------------------------------------------------------
# Reference-format PEFT checkpoints (LoRA / adapter v1+v2) -> overlay pytrees
# ---------------------------------------------------------------------------


def peft_sd_kind(sd: Mapping[str, Array]) -> Optional[str]:
    """Classify a reference-format flat state dict: 'lora' | 'adapter' | None.

    Reference LoRA checkpoints hold only ``*.lora_A``/``*.lora_B`` entries
    (lora_state_dict, reference lit_llama/lora.py:364-395); adapter checkpoints
    hold ``*.adapter_wte.weight``/``*.gating_factor`` (+ v2's ``adapter_bias``/
    ``adapter_scale``/norm scales, adapter_v2.py:11-27)."""
    for name in sd:
        if "lora_A" in name or "lora_B" in name:
            return "lora"
        if "adapter_wte" in name or "gating_factor" in name:
            return "adapter"
    return None


def lora_sd_to_overlay(
    sd: Mapping[str, Array], config: LLaMAConfig, dtype=None
) -> Dict[str, Any]:
    """Reference LoRA state dict -> our LoRA overlay pytree, returning
    ``({"h": {"attn": {"c_attn": {"lora_a", "lora_b"}}}}, r)``.

    Reference layout per layer (lit_llama/lora.py:150-162):
      ``lora_A``: (Σenable·r, D) — stacked per-enabled-group (r, D) blocks, rows
      ordered [q-block; v-block] for the default enable=[T, F, T];
      ``lora_B``: (Σenable·D_group, r) — stacked per-group (D, r) conv1d filters.
    Ours (peft/lora.py:17-18): ``lora_a`` (L, D, Σenable·r) = lora_A.T stacked;
    ``lora_b`` (L, n_en, r, D) with b[g] = lora_B[g·D:(g+1)·D].T.
    """
    import jax.numpy as jnp

    dtype = jnp.dtype(dtype or config.param_dtype)
    L, D = config.n_layer, config.n_embd
    enable = config.lora.enable if config.lora is not None else (True, False, True)
    n_en = sum(enable)
    a_list, b_list = [], []
    r = None
    for i in range(L):
        A = _materialize(sd[f"transformer.h.{i}.attn.c_attn.lora_A"]).astype(np.float32)
        B = _materialize(sd[f"transformer.h.{i}.attn.c_attn.lora_B"]).astype(np.float32)
        r = A.shape[0] // n_en
        group = B.shape[0] // n_en  # == D for the fused c_attn
        a_list.append(A.T)  # (D, n_en*r)
        b_list.append(
            np.stack([B[g * group : (g + 1) * group, :].T for g in range(n_en)])
        )  # (n_en, r, group)
    overlay = {
        "h": {
            "attn": {
                "c_attn": {
                    "lora_a": jnp.asarray(np.stack(a_list), dtype),
                    "lora_b": jnp.asarray(np.stack(b_list), dtype),
                }
            }
        }
    }
    return overlay, int(r)


def lora_overlay_to_sd(
    overlay: Dict[str, Any], config: LLaMAConfig
) -> Dict[str, np.ndarray]:
    """Our LoRA overlay pytree -> reference-format state dict (export parity)."""
    c_attn = overlay["h"]["attn"]["c_attn"]
    a = np.asarray(c_attn["lora_a"], np.float32)  # (L, D, n_en*r)
    b = np.asarray(c_attn["lora_b"], np.float32)  # (L, n_en, r, D)
    out: Dict[str, np.ndarray] = {}
    for i in range(a.shape[0]):
        out[f"transformer.h.{i}.attn.c_attn.lora_A"] = a[i].T
        out[f"transformer.h.{i}.attn.c_attn.lora_B"] = np.concatenate(
            [b[i, g].T for g in range(b.shape[1])], axis=0
        )
    return out


def adapter_sd_to_overlay(
    sd: Mapping[str, Array], config: LLaMAConfig, dtype=None
) -> Dict[str, Any]:
    """Reference adapter (v1 or v2) state dict -> our overlay pytree, returning
    ``(overlay, prompt_length, start_layer, is_v2)``.

    Reference stores ``adapter_wte.weight`` (aT, D) and ``gating_factor`` only on
    layers >= adapter_start_layer (adapter.py:74-79); old checkpoints carry a
    single scalar gate which newer code broadcasts per-head
    (adapter.py:176-190) — reproduced here. v2 adds per-linear
    ``adapter_bias``/``adapter_scale`` and the RMSNorm scales
    (adapter_v2.py:11-48). Layers below the start layer get zero prompts/gates in
    the stacked layout; ``adapter_active`` masks them out of the forward.
    """
    import jax.numpy as jnp

    dtype = jnp.dtype(dtype or config.param_dtype)
    L, D, H = config.n_layer, config.n_embd, config.n_head
    wte_by_layer: Dict[int, np.ndarray] = {}
    gate_by_layer: Dict[int, np.ndarray] = {}
    for name, tensor in sd.items():
        if ".attn.adapter_wte.weight" in name:
            wte_by_layer[int(name.split(".")[2])] = _materialize(tensor).astype(np.float32)
        elif ".attn.gating_factor" in name:
            g = _materialize(tensor).astype(np.float32)
            if g.ndim < 4:  # old single-gate checkpoints -> broadcast per head
                g = np.full((H,), float(g.reshape(-1)[0]), np.float32)
            else:  # (1, H, 1, 1)
                g = g.reshape(H)
            gate_by_layer[int(name.split(".")[2])] = g
    if not wte_by_layer:
        raise ValueError("no adapter_wte entries — not a reference adapter checkpoint")
    start_layer = min(wte_by_layer)
    aT = next(iter(wte_by_layer.values())).shape[0]
    wte = np.zeros((L, aT, D), np.float32)
    gating = np.zeros((L, H), np.float32)
    for i, w in wte_by_layer.items():
        wte[i] = w
    for i, g in gate_by_layer.items():
        gating[i] = g
    overlay: Dict[str, Any] = {
        "h": {
            "adapter_wte": jnp.asarray(wte, dtype),
            "gating": jnp.asarray(gating, dtype),
            "adapter_active": jnp.asarray(
                (np.arange(L) >= start_layer).astype(np.float32)[:, None], dtype
            ),
        }
    }

    is_v2 = any("adapter_bias" in name for name in sd)
    if is_v2:
        h = overlay["h"]
        V = config.padded_vocab_size

        def stack_v2(lit_name: str, ours: tuple, out_dim: int) -> None:
            bias = np.zeros((L, 1, out_dim), np.float32)
            scale = np.ones((L, 1, out_dim), np.float32)
            for i in range(L):
                b = sd.get(f"transformer.h.{i}.{lit_name}.adapter_bias")
                s = sd.get(f"transformer.h.{i}.{lit_name}.adapter_scale")
                if b is not None:
                    bias[i, 0] = _materialize(b).astype(np.float32)
                if s is not None:
                    scale[i, 0] = _materialize(s).astype(np.float32)
            node = h
            for k in ours:
                node = node.setdefault(k, {})
            node["av2_bias"] = jnp.asarray(bias, dtype)
            node["av2_scale"] = jnp.asarray(scale, dtype)

        stack_v2("attn.c_attn", ("attn", "c_attn"), 3 * D)
        stack_v2("attn.c_proj", ("attn", "c_proj"), D)
        stack_v2("mlp.c_fc1", ("mlp", "c_fc1"), config.intermediate_size)
        stack_v2("mlp.c_fc2", ("mlp", "c_fc2"), config.intermediate_size)
        stack_v2("mlp.c_proj", ("mlp", "c_proj"), D)

        def pad_cols(arr: np.ndarray, fill: float) -> np.ndarray:
            if arr.shape[-1] < V:
                arr = np.concatenate(
                    [arr, np.full(arr.shape[:-1] + (V - arr.shape[-1],), fill, np.float32)],
                    axis=-1,
                )
            return arr

        if "lm_head.adapter_bias" in sd:
            overlay["lm_head"] = {
                "av2_bias": jnp.asarray(
                    pad_cols(_materialize(sd["lm_head.adapter_bias"]).astype(np.float32)[None, :], 0.0),
                    dtype,
                ),
                "av2_scale": jnp.asarray(
                    pad_cols(_materialize(sd["lm_head.adapter_scale"]).astype(np.float32)[None, :], 1.0),
                    dtype,
                ),
            }
        rms1 = [sd.get(f"transformer.h.{i}.rms_1.scale") for i in range(L)]
        rms2 = [sd.get(f"transformer.h.{i}.rms_2.scale") for i in range(L)]
        if all(t is not None for t in rms1):
            h["rms_1"] = jnp.asarray(
                np.stack([_materialize(t).astype(np.float32) for t in rms1]), dtype
            )
        if all(t is not None for t in rms2):
            h["rms_2"] = jnp.asarray(
                np.stack([_materialize(t).astype(np.float32) for t in rms2]), dtype
            )
        if "transformer.ln_f.scale" in sd:
            overlay["ln_f"] = jnp.asarray(
                _materialize(sd["transformer.ln_f.scale"]).astype(np.float32), dtype
            )
    return overlay, int(aT), int(start_layer), is_v2


def pytree_to_lit(params: Dict[str, Any], config: LLaMAConfig) -> Dict[str, np.ndarray]:
    """Our pytree -> lit-llama flat state dict (torch orientation), for export."""
    out: Dict[str, np.ndarray] = {}
    out["transformer.wte.weight"] = np.asarray(params["wte"])
    out["transformer.ln_f.scale"] = np.asarray(params["ln_f"])
    out["lm_head.weight"] = np.asarray(params["lm_head"]["w"]).T
    L = config.n_layer
    h = params["h"]
    for i in range(L):
        out[f"transformer.h.{i}.rms_1.scale"] = np.asarray(h["rms_1"][i])
        out[f"transformer.h.{i}.rms_2.scale"] = np.asarray(h["rms_2"][i])
        out[f"transformer.h.{i}.attn.c_attn.weight"] = np.asarray(h["attn"]["c_attn"]["w"][i]).T
        out[f"transformer.h.{i}.attn.c_proj.weight"] = np.asarray(h["attn"]["c_proj"]["w"][i]).T
        for name in ("c_fc1", "c_fc2", "c_proj"):
            out[f"transformer.h.{i}.mlp.{name}.weight"] = np.asarray(h["mlp"][name]["w"][i]).T
    return out
