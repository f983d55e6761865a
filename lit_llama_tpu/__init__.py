"""TPU-native LLaMA framework (JAX / XLA / Pallas / pjit).

A from-scratch rebuild of Lightning-AI/lit-llama's capability set, designed TPU-first:
pure-functional model over a parameter pytree, Pallas kernels for the hot ops,
sharding via jax.sharding.Mesh + PartitionSpecs, quantized inference (llm.int8-style
and GPTQ int4), PEFT (LoRA / Adapter v1 / Adapter v2), pretraining and finetuning.
"""

from lit_llama_tpu.models.config import AdapterConfig, LLaMAConfig, LoRAConfig
from lit_llama_tpu.models import llama
from lit_llama_tpu.models.llama import forward, init_kv_cache, init_params
from lit_llama_tpu.ops.rope import apply_rope, build_rope_cache
from lit_llama_tpu.utils.math import find_multiple

__all__ = [
    "AdapterConfig",
    "LLaMAConfig",
    "LoRAConfig",
    "llama",
    "forward",
    "init_kv_cache",
    "init_params",
    "apply_rope",
    "build_rope_cache",
    "find_multiple",
]

__version__ = "0.1.0"
