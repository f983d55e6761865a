"""Model configuration for the TPU-native LLaMA family.

Capability parity with the reference's ``LLaMAConfig`` (reference: lit_llama/model.py:25-48):
same named presets (7B/13B/30B/65B), same vocab padding to a multiple of 64, same SwiGLU
hidden sizing rule. TPU-first additions: explicit dtype policy and quantization/PEFT layer
variants resolved at model-build time (no runtime monkeypatching — the reference swaps
classes via context managers, lit_llama/lora.py:449-478 / lit_llama/utils.py:141-162).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

from lit_llama_tpu.utils.math import find_multiple


@dataclass(frozen=True)
class LoRAConfig:
    """LoRA hyperparameters (reference: lit_llama/lora.py:435-446).

    LoRA is applied to the fused QKV projection with Q and V enabled and K disabled,
    matching the reference's ``enable_lora=[True, False, True]`` (lora.py:436).
    """

    r: int = 8
    alpha: float = 16.0
    dropout: float = 0.05
    # Which of the fused (q, k, v) projections receive a low-rank update.
    enable_q: bool = True
    enable_k: bool = False
    enable_v: bool = True

    @property
    def scaling(self) -> float:
        # reference: lit_llama/lora.py:171
        return self.alpha / self.r

    @property
    def enable(self) -> Tuple[bool, bool, bool]:
        return (self.enable_q, self.enable_k, self.enable_v)


@dataclass(frozen=True)
class AdapterConfig:
    """LLaMA-Adapter v1/v2 hyperparameters (reference: lit_llama/adapter.py:55-58)."""

    prompt_length: int = 10
    start_layer: int = 2
    # v2 adds learnable bias/scale on every linear and trains the RMSNorm params
    # (reference: lit_llama/adapter_v2.py:11-48).
    v2: bool = False


@dataclass(frozen=True)
class LLaMAConfig:
    """Hyperparameters of one LLaMA model (reference: lit_llama/model.py:25-48)."""

    block_size: int = 2048
    vocab_size: int = 32000
    padded_vocab_size: Optional[int] = None
    n_layer: int = 32
    n_head: int = 32
    n_embd: int = 4096

    # --- TPU-first extensions (not present in the reference) ---
    # Numeric policy: params stored in param_dtype, matmuls/activations in compute_dtype.
    # "bf16-true" == both bfloat16; "bf16-mixed" == fp32 params, bf16 compute.
    param_dtype: str = "float32"
    compute_dtype: str = "float32"
    # Weight-quantization mode for linear layers: None | "int8" | "int4".
    # Replaces the reference's quantization() context manager (lit_llama/utils.py:141-162).
    quantize: Optional[str] = None
    # Group size for int4 group quantization (reference ColBlockQuantizedLinear tile_cols;
    # -1 means one group per full row, lit_llama/quantization.py:345-355).
    quant_groupsize: int = 128
    # KV-cache storage: None/"compute" keeps compute_dtype; "int8" stores k/v
    # symmetric-quantized per (position, head) vector with an f32 scale —
    # half the cache memory and read bandwidth (beyond the reference; see
    # PAPERS.md KV-cache quantization line).
    kv_cache_dtype: Optional[str] = None
    # RoPE pairing convention: "interleaved" (Meta, pairs (2i, 2i+1) — what
    # every checkpoint converter produces) or "half" (pairs (i, i+hs/2) — set
    # by ops/fused_layer.prepare_fused_params together with the matching q/k
    # column permutation; the model is mathematically identical).
    rope_layout: str = "interleaved"
    # PEFT variants, resolved at build time instead of monkeypatching.
    lora: Optional[LoRAConfig] = None
    adapter: Optional[AdapterConfig] = None

    def __post_init__(self):
        if self.padded_vocab_size is None:
            object.__setattr__(
                self, "padded_vocab_size", find_multiple(self.vocab_size, 64)
            )

    @property
    def head_size(self) -> int:
        return self.n_embd // self.n_head

    @property
    def intermediate_size(self) -> int:
        """SwiGLU hidden dim (reference: lit_llama/model.py:245-247)."""
        return find_multiple(int(2 * 4 * self.n_embd / 3), 256)

    @classmethod
    def from_name(cls, name: str, **overrides) -> "LLaMAConfig":
        """Named presets (reference: lit_llama/model.py:38-48)."""
        return cls(**{**llama_configs[name], **overrides})

    def replace(self, **kwargs) -> "LLaMAConfig":
        return dataclasses.replace(self, **kwargs)


# reference: lit_llama/model.py:43-48
llama_configs = {
    "7B": dict(n_layer=32, n_head=32, n_embd=4096),
    "13B": dict(n_layer=40, n_head=40, n_embd=5120),
    "30B": dict(n_layer=60, n_head=52, n_embd=6656),
    "65B": dict(n_layer=80, n_head=64, n_embd=8192),
}
