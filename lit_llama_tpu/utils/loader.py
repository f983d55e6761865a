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
        params = llama.quantize_params(params, config)
    return params, config
