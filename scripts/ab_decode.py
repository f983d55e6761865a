"""Single-stream 7B int4 decode at the headline geometry — one JSON line.

A/B tool for kernel variants selected by env (LIT_LLAMA_TPU_UNPACK,
LIT_LLAMA_TPU_LPL, LIT_LLAMA_TPU_FUSED): the knobs are read at trace time
inside the kernels, so each arm must run in its own process. bench.py is the
driver-facing harness; this is the minimal decode-only core for fast A/Bs
(skips serving/int8/S=2048 rows).
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax

    from bench import _measure_decode, build_decode_params
    from lit_llama_tpu import LLaMAConfig
    from lit_llama_tpu.utils.cli import _apply_platform_override

    _apply_platform_override()
    if jax.default_backend() == "cpu":
        # the full 7B tree is ~3.5 GB of host params and minutes per token on
        # CPU — fail fast instead of silently crawling (ADVICE r4)
        print(json.dumps({"error": "ab_decode requires an accelerator"}))
        sys.exit(1)
    max_new = int(os.environ.get("AB_MAX_NEW", "64"))
    max_seq = int(os.environ.get("AB_MAX_SEQ", "0"))  # 0 = headline (8+new)

    config = LLaMAConfig.from_name(
        "7B", param_dtype="bfloat16", compute_dtype="bfloat16", quantize="int4"
    )
    params, config = build_decode_params(config)

    seq = max_seq or min(config.block_size, 8 + max_new)
    tok_s, compile_s, times, n_tok = _measure_decode(params, config, max_new, seq)
    print(
        json.dumps(
            {
                "metric": "ab_decode_tok_s",
                "value": round(tok_s, 2),
                "unpack": os.environ.get("LIT_LLAMA_TPU_UNPACK", "i32"),
                "lpl": os.environ.get("LIT_LLAMA_TPU_LPL", "1"),
                "fused": os.environ.get("LIT_LLAMA_TPU_FUSED", "1"),
                "max_seq": seq,
                "compile_s": round(compile_s, 1),
                "runs": [round(t, 3) for t in times],
                "n_tok": n_tok,
            }
        )
    )


if __name__ == "__main__":
    main()
