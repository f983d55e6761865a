"""End-to-end CLI workflow test: tiny checkpoint -> prepare -> LoRA finetune ->
generate with overlay -> GPTQ quantize -> evaluate from the quantized dir.
Mirrors the reference's CLI smoke strategy but drives the real binaries
(SURVEY.md §4). Runs on CPU with a tiny model; one subprocess per stage.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent


def run_cli(args, timeout=420):
    env = dict(os.environ, LIT_LLAMA_TPU_PLATFORM="cpu")
    proc = subprocess.run(
        [sys.executable, *args],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, f"{args}\nstdout:{proc.stdout[-2000:]}\nstderr:{proc.stderr[-2000:]}"
    return proc


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_e2e")
    run_cli(["scripts/make_tiny_checkpoint.py", "--out_dir", str(d / "ckpt")])
    samples = [
        {"instruction": f"Say word {i}", "input": "", "output": f"word {i} dog fox"}
        for i in range(24)
    ]
    (d / "alpaca.json").write_text(json.dumps(samples))
    (d / "eval.txt").write_text(
        "the quick brown fox jumps over the lazy dog\n"
        "pack my box with five dozen liquor jugs\n" * 80
    )
    return d


def test_prepare_and_lora_finetune_and_generate(workdir):
    d = workdir
    run_cli(
        [
            "scripts/prepare_alpaca.py",
            "--destination_path", str(d / "data"),
            "--tokenizer_path", str(d / "ckpt/tokenizer.model"),
            "--data_file", str(d / "alpaca.json"),
            "--test_split_size", "4",
            "--max_seq_length", "64",
        ]
    )
    run_cli(
        [
            "finetune/lora.py",
            "--data_dir", str(d / "data"),
            "--checkpoint_path", str(d / "ckpt/lit-llama.pth"),
            "--tokenizer_path", str(d / "ckpt/tokenizer.model"),
            "--out_dir", str(d / "lora"),
            "--max_iters", "2",
            "--batch_size", "4",
            "--micro_batch_size", "2",
            "--eval_interval", "1000",
            "--save_interval", "1000",
            "--warmup_iters", "1",
            "--max_seq_length", "64",
        ]
    )
    assert (d / "lora/lit-llama-lora-finetuned/manifest.json").is_file()
    proc = run_cli(
        [
            "generate/lora.py",
            "--prompt", "the quick",
            "--lora_path", str(d / "lora/lit-llama-lora-finetuned"),
            "--checkpoint_path", str(d / "ckpt/lit-llama.pth"),
            "--tokenizer_path", str(d / "ckpt/tokenizer.model"),
            "--max_new_tokens", "5",
        ]
    )
    assert proc.stdout.strip()
    # BASELINE config #4: the same LoRA overlay on a QUANTIZED base (the
    # reference refuses this combination, reference generate/lora.py:61-62)
    proc = run_cli(
        [
            "generate/lora.py",
            "--prompt", "the quick",
            "--lora_path", str(d / "lora/lit-llama-lora-finetuned"),
            "--checkpoint_path", str(d / "ckpt/lit-llama.pth"),
            "--tokenizer_path", str(d / "ckpt/tokenizer.model"),
            "--max_new_tokens", "5",
            "--quantize", "gptq.int4",
        ]
    )
    assert proc.stdout.strip()


def test_gptq_quantize_then_eval_and_generate(workdir):
    d = workdir
    run_cli(
        [
            "quantize/gptq.py",
            "--checkpoint_path", str(d / "ckpt/lit-llama.pth"),
            "--tokenizer_path", str(d / "ckpt/tokenizer.model"),
            "--output_path", str(d / "gptq"),
            "--n_samples", "4",
            "--block_size", "32",
            "--groupsize", "32",
            "--data_file", str(d / "eval.txt"),
        ]
    )
    assert (d / "gptq/manifest.json").is_file()
    proc = run_cli(
        [
            "evaluate/full.py",
            "--datasets", "wikitext",
            "--data_file", str(d / "eval.txt"),
            "--checkpoint_path", str(d / "gptq"),
            "--tokenizer_path", str(d / "ckpt/tokenizer.model"),
            "--block_size", "64",
            "--max_windows", "2",
        ]
    )
    assert "perplexity:" in proc.stdout
    ppl = float(proc.stdout.split("perplexity:")[1].strip())
    assert np.isfinite(ppl) and ppl > 1.0


def test_adapter_v2_finetune_then_quantized_generate(workdir):
    """finetune/adapter_v2.py output loads back into generate/adapter_v2.py
    (the save filter keeps trainables only — no adapter_active in the file)
    and composes with a quantized base (BASELINE config #4)."""
    d = workdir
    run_cli(
        [
            "finetune/adapter_v2.py",
            "--data_dir", str(d / "data"),
            "--checkpoint_path", str(d / "ckpt/lit-llama.pth"),
            "--tokenizer_path", str(d / "ckpt/tokenizer.model"),
            "--out_dir", str(d / "av2"),
            "--max_iters", "2",
            "--batch_size", "4",
            "--micro_batch_size", "2",
            "--eval_interval", "1000",
            "--save_interval", "1000",
            "--warmup_iters", "1",
            "--max_seq_length", "64",
        ]
    )
    proc = run_cli(
        [
            "generate/adapter_v2.py",
            "--prompt", "the quick",
            "--adapter_path", str(d / "av2/lit-llama-adapter-v2-finetuned"),
            "--checkpoint_path", str(d / "ckpt/lit-llama.pth"),
            "--tokenizer_path", str(d / "ckpt/tokenizer.model"),
            "--max_new_tokens", "5",
            "--quantize", "llm.int8",
        ]
    )
    assert proc.stdout.strip()
