"""GPTQ at 65B geometry under a bounded-memory cap (VERDICT r4 next #8).

Runs quantize_model_gptq at the REAL 65B layer shape (n_embd 8192,
intermediate 22016, 64 heads — models/config.py "65B") at reduced depth, with
``host_spill`` active: stage activations live on the host, the device holds one
layer's weights + one Hessian + one calibration slice at a time — the
reference's one-block-on-device discipline
(reference: quantize/gptq.py:74-75,116-129). Prints peak device memory so the
cap is MEASURED, not asserted.

Chip usage: timeout 3600 python scripts/gptq_65b_dryrun.py
CPU smoke:  LIT_LLAMA_TPU_PLATFORM=cpu python scripts/gptq_65b_dryrun.py \
                --n_layer 1 --n_samples 2 --seq 32 --rows 512
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

import numpy as np


def main(
    n_layer: int = 1,
    n_samples: int = 16,
    seq: int = 2048,
    groupsize: int = 128,
    batch: int = 2,
    rows: int = 0,
    mem_cap_gb: float = 14.0,
) -> None:
    """65B-shape GPTQ dry run with host-spilled stages.

    Args:
        n_layer: Transformer blocks to quantize (depth doesn't change the
            per-layer memory model; 65B is this x 80).
        n_samples: Calibration sequences (reference protocol: 128).
        seq: Calibration sequence length (reference: 2048).
        groupsize: Quantization group size.
        batch: Device-resident calibration slice.
        rows: Truncate the contraction dim of the row walk for CPU smoke
            (0 = full 65B widths).
        mem_cap_gb: Fail if peak device memory exceeds this.
    """
    from lit_llama_tpu.utils.cli import _apply_platform_override

    _apply_platform_override()
    import jax

    from lit_llama_tpu.models.config import LLaMAConfig
    from lit_llama_tpu.quant import gptq

    cfg65 = LLaMAConfig.from_name("65B")
    D, I, H = cfg65.n_embd, cfg65.intermediate_size, cfg65.n_head
    if rows:
        # CPU smoke: shrink widths (keeps the host-spill code path, drops the
        # 22016-row fori_loop walk that only a TPU finishes in sane time)
        D, I, H = rows, rows * 2, rows // 128
    config = LLaMAConfig(
        block_size=max(seq, 128), vocab_size=32000, n_layer=n_layer,
        n_head=H, n_embd=D, quant_groupsize=groupsize,
    )
    # intermediate_size is derived; assert the 65B shape when not truncated
    if not rows:
        assert config.intermediate_size == I, (config.intermediate_size, I)

    rng = np.random.default_rng(0)
    L = n_layer

    def w(shape):
        return (rng.standard_normal(shape) * 0.01).astype(np.float32)

    # HOST-resident dense params (a real 65B checkpoint never fits HBM)
    params = {
        "wte": w((config.padded_vocab_size, D)),
        "h": {
            "rms_1": np.ones((L, D), np.float32),
            "attn": {
                "c_attn": {"w": w((L, D, 3 * D))},
                "c_proj": {"w": w((L, D, D))},
            },
            "rms_2": np.ones((L, D), np.float32),
            "mlp": {
                "c_fc1": {"w": w((L, D, config.intermediate_size))},
                "c_fc2": {"w": w((L, D, config.intermediate_size))},
                "c_proj": {"w": w((L, config.intermediate_size, D))},
            },
        },
        "ln_f": np.ones((D,), np.float32),
        "lm_head": {"w": w((D, config.padded_vocab_size))},
    }
    calib = rng.integers(1, 32000, size=(n_samples, seq)).astype(np.int32)

    t0 = time.perf_counter()
    out = gptq.quantize_model_gptq(
        params, config, calib, groupsize=groupsize, batch=batch, host_spill=True
    )
    dt = time.perf_counter() - t0

    assert isinstance(out["h"]["attn"]["c_attn"]["qw"], np.ndarray)
    assert out["h"]["mlp"]["c_proj"]["qw"].shape == (
        L, config.intermediate_size // 2, D,
    )
    mem = jax.local_devices()[0].memory_stats() or {}
    peak_gb = mem.get("peak_bytes_in_use", 0) / 2**30
    rec = {
        "metric": "gptq_65b_shape_dryrun",
        "n_layer": n_layer,
        "n_samples": n_samples,
        "seq": seq,
        "widths": [D, config.intermediate_size],
        "seconds": round(dt, 1),
        "peak_device_gb": round(peak_gb, 2),
        "mem_cap_gb": mem_cap_gb,
        "ok": (peak_gb == 0.0) or (peak_gb <= mem_cap_gb),
    }
    print(json.dumps(rec))
    if not rec["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(main)
