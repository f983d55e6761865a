"""Driver-protocol serving measurement only (bench.py's `_measure_serving`
verbatim) — for on-chip steps_per_sync / prefill_budget / slot-count A/Bs
without paying the headline + S=2048 + int8 rows each arm.

Usage: timeout 2400 python scripts/serving_probe.py --max_batch 32 \
           --steps_per_sync 4 --prefill_budget 2048
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def main(max_batch: int = 32, steps_per_sync: int = 8,
         prefill_budget: int = 1024) -> None:
    """One serving measurement at the driver protocol.

    Args:
        max_batch: Engine slot count.
        steps_per_sync: Decode steps per admission cycle.
        prefill_budget: Prompt tokens prefillable per cycle.
    """
    from lit_llama_tpu.utils.cli import _apply_platform_override

    _apply_platform_override()
    import jax

    if jax.default_backend() == "cpu":
        print(json.dumps({"error": "serving_probe requires an accelerator"}))
        sys.exit(1)

    from bench import _measure_serving, build_decode_params
    from lit_llama_tpu import LLaMAConfig

    config = LLaMAConfig.from_name(
        "7B", param_dtype="bfloat16", compute_dtype="bfloat16", quantize="int4"
    )
    params, config = build_decode_params(config)
    tok_s, ttft_p50, ttft_w1, warmup_s = _measure_serving(
        params, config, max_batch, steps_per_sync, prefill_budget
    )
    print(
        json.dumps(
            {
                "metric": "serving_probe",
                "max_batch": max_batch,
                "steps_per_sync": steps_per_sync,
                "prefill_budget": prefill_budget,
                "tok_s": round(tok_s, 1),
                "ttft_p50_s": round(ttft_p50, 3),
                "ttft_p50_admission_s": round(ttft_w1, 3),
                "warmup_s": round(warmup_s, 1),
            }
        )
    )


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(main)
