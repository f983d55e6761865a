"""Model loading shared by the workload CLIs (generate/finetune/evaluate/quantize).

Handles both checkpoint families:
* lit-llama ``.pth`` (torch zip-pickle) through the torch-free reader
  (utils/pth_reader.py), with config inferred from a sibling config.json or the
  embedding width (reference: llama_model_lookup, lit_llama/utils.py:21-35);
* our native manifest+bin checkpoint directories (utils/checkpoint.py).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from lit_llama_tpu.models import llama
from lit_llama_tpu.models.config import LLaMAConfig
from lit_llama_tpu.utils import checkpoint as ckpt
from lit_llama_tpu.utils import convert
from lit_llama_tpu.utils.pth_reader import llama_model_lookup, load_pth

_CONFIG_KEYS = (
    "block_size",
    "vocab_size",
    "padded_vocab_size",
    "n_layer",
    "n_head",
    "n_embd",
    "quantize",
    "quant_groupsize",
)


def load_model(
    checkpoint_path: Path,
    quantize: Optional[str] = None,
    model_size: Optional[str] = None,
    dtype: Optional[str] = None,
) -> Tuple[Dict[str, Any], LLaMAConfig]:
    """Load (params, config) from a lit-llama .pth or a native checkpoint dir.

    ``quantize``: None | "llm.int8" | "gptq.int4" | "int8" | "int4" — round-to-
    nearest weight quantization applied at load (for true GPTQ run
    quantize/gptq.py and pass its output instead, reference: howto/inference.md).
    """
    if dtype is None:
        dtype = "float32" if jax.default_backend() == "cpu" else "bfloat16"
    checkpoint_path = Path(checkpoint_path)
    if checkpoint_path.is_dir():
        meta = ckpt.load_metadata(checkpoint_path)
        if "config" in meta:
            kw = {k: v for k, v in meta["config"].items() if k in _CONFIG_KEYS}
            config = LLaMAConfig(**kw)
        else:
            config = LLaMAConfig.from_name(model_size or "7B")
        config = config.replace(param_dtype=dtype, compute_dtype=dtype)
        tree = ckpt.load_checkpoint(
            checkpoint_path, transform=lambda name, a: jnp.asarray(a)
        )
        params = tree["params"] if "params" in tree else tree
        if quantize is not None:
            mode = {"llm.int8": "int8", "gptq.int4": "int4"}.get(quantize, quantize)
            if config.quantize is None:
                # dense native checkpoint (e.g. from finetune/full.py):
                # round-to-nearest quantize at load, same as the .pth path
                config = _clamp_groupsize(config.replace(quantize=mode))
                params = llama.quantize_params(params, config)
            elif config.quantize != mode:
                raise ValueError(
                    f"{checkpoint_path} is already quantized as {config.quantize};"
                    f" cannot re-quantize to {mode}"
                )
        return params, config

    sd = load_pth(checkpoint_path)
    config_json = checkpoint_path.parent / "config.json"
    if model_size is None and config_json.is_file():
        kw = {
            k: v
            for k, v in json.loads(config_json.read_text()).items()
            if k in _CONFIG_KEYS
        }
        config = LLaMAConfig(**kw, param_dtype=dtype, compute_dtype=dtype)
    else:
        name = model_size or llama_model_lookup(sd)
        config = LLaMAConfig.from_name(name, param_dtype=dtype, compute_dtype=dtype)
    if quantize is not None:
        mode = {"llm.int8": "int8", "gptq.int4": "int4"}.get(quantize, quantize)
        config = config.replace(quantize=mode)
    params = convert.lit_to_pytree(sd, config, dtype=dtype)
    if config.quantize is not None:
        config = _clamp_groupsize(config)
        params = llama.quantize_params(params, config)
    return params, config


def _clamp_groupsize(config: LLaMAConfig) -> LLaMAConfig:
    """Largest legal int4 group size <= the configured one: every quantized
    linear's input width (n_embd, intermediate_size) must be divisible by
    2*groupsize (half-split nibble planes, ops/linear.pack_int4). Small test
    models (n_embd 64) can't take the 7B default of 128."""
    if config.quantize != "int4":
        return config
    widths = (config.n_embd, config.intermediate_size)
    gs = config.quant_groupsize
    while gs > 1 and any(w % (2 * gs) for w in widths):
        gs //= 2
    if gs != config.quant_groupsize:
        config = config.replace(quant_groupsize=gs)
    return config


def load_peft_checkpoint(
    path: Path, config: LLaMAConfig
) -> Tuple[str, Dict[str, Any], Dict[str, Any]]:
    """Load a PEFT (LoRA / adapter) checkpoint in either format.

    Accepts our native manifest directories (from finetune/*.py) AND
    reference-format torch ``.pth`` state dicts as written by the reference's
    finetune scripts (lora_state_dict, reference lit_llama/lora.py:364-395;
    adapter_state_from_state_dict, adapter.py:313-315; v2, adapter_v2.py:24-27)
    — a user's reference-trained adapters run here unchanged.

    Returns ``(kind, overlay, info)``: kind is 'lora' or 'adapter'; overlay is
    the pytree for peft.lora.load_lora_state / peft.adapter.load_adapter_state;
    info holds inferred hyperparameters ('r' for LoRA; 'prompt_length',
    'start_layer', 'v2' for adapter).
    """
    path = Path(path)
    if path.is_dir():
        tree = ckpt.load_checkpoint(path, transform=lambda n, a: jnp.asarray(a))
        overlay = tree["params"] if "params" in tree else tree
        h = overlay.get("h", {})
        if "attn" in h and "lora_a" in h.get("attn", {}).get("c_attn", {}):
            r = int(h["attn"]["c_attn"]["lora_b"].shape[-2])
            return "lora", overlay, {"r": r}
        if "adapter_wte" in h:
            if "adapter_active" in h:
                active = jnp.asarray(h["adapter_active"][:, 0])
                start_layer = int(jnp.argmax(active)) if bool(active.any()) else 0
            else:
                # finetune/adapter*.py save only trainables; adapter_active is
                # a derived constant (reference default: adapt every layer)
                start_layer = 0
            is_v2 = "av2_bias" in h.get("attn", {}).get("c_attn", {})
            return "adapter", overlay, {
                "prompt_length": int(h["adapter_wte"].shape[1]),
                "start_layer": start_layer,
                "v2": is_v2,
            }
        raise ValueError(f"{path} is not a LoRA or adapter checkpoint")

    sd = load_pth(path)
    kind = convert.peft_sd_kind(sd)
    if kind == "lora":
        overlay, r = convert.lora_sd_to_overlay(sd, config)
        return "lora", overlay, {"r": r}
    if kind == "adapter":
        overlay, aT, start_layer, is_v2 = convert.adapter_sd_to_overlay(sd, config)
        return "adapter", overlay, {
            "prompt_length": aT,
            "start_layer": start_layer,
            "v2": is_v2,
        }
    raise ValueError(f"{path} holds neither LoRA nor adapter entries")
