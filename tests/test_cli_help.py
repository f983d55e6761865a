"""Every entry point parses --help (reference: CLI smoke tests via
subprocess [-h], tests/test_generate.py:115-119). Catches import/signature
breakage across the whole workload surface in one sweep."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent


ENTRY_POINTS = [
    "generate.py",
    "serve.py",
    "generate/full.py",
    "generate/lora.py",
    "generate/adapter.py",
    "generate/adapter_v2.py",
    "pretrain/shakespeare.py",
    "pretrain/redpajama.py",
    "finetune/full.py",
    "finetune/lora.py",
    "finetune/adapter.py",
    "finetune/adapter_v2.py",
    "evaluate/full.py",
    "evaluate/lora.py",
    "evaluate/adapter.py",
    "evaluate/adapter_v2.py",
    "quantize/gptq.py",
    "scripts/prepare_shakespeare.py",
    "scripts/prepare_alpaca.py",
    "scripts/prepare_dolly.py",
    "scripts/prepare_any_text.py",
    "scripts/prepare_redpajama.py",
    "scripts/convert_checkpoint.py",
    "scripts/convert_hf_checkpoint.py",
    "scripts/convert_lora_weights.py",
    "scripts/download.py",
    "scripts/make_tiny_checkpoint.py",
    "scripts/bench_serving.py",
    "scripts/bench_training.py",
    "scripts/eval_quality.py",
    "scripts/comm_anatomy.py",
    "scripts/compile_anatomy.py",
    "scripts/serving_probe.py",
    "scripts/gptq_65b_dryrun.py",
    "scripts/prepare_code_corpus.py",
]


@pytest.mark.parametrize("script", ENTRY_POINTS)
def test_cli_help(script):
    env = dict(os.environ, LIT_LLAMA_TPU_PLATFORM="cpu")
    proc = subprocess.run(
        [sys.executable, script, "-h"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, f"{script}: {proc.stderr[-1500:]}"
    assert "--help" in proc.stdout or "usage" in proc.stdout.lower()
