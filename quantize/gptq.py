"""GPTQ post-training quantization CLI (reference: quantize/gptq.py:153-233 —
blockwise PTQ on 128×2048-token C4 samples, saves the quantized checkpoint).

The reference calibrates on C4 via the HF hub; offline, pass ``--data_file``
(raw text) or omit it to fall back to random tokens (smoke only — expect worse
quantization quality than real calibration data).
"""

import sys
import time
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

import numpy as np


def get_sample_data(tokenizer, n_samples: int, block_size: int, data_file, vocab_size, seed=42):
    """(n_samples, block_size) calibration tokens (reference: gptq.py:24-35)."""
    rng = np.random.default_rng(seed)
    if data_file is not None:
        tokens = tokenizer.encode(Path(data_file).read_text(), bos=False)
        if len(tokens) < n_samples * block_size:
            reps = -(-n_samples * block_size // len(tokens))
            tokens = np.tile(tokens, reps)
        starts = rng.integers(0, len(tokens) - block_size, size=n_samples)
        return np.stack([tokens[s : s + block_size] for s in starts]).astype(np.int32)
    try:
        from datasets import load_dataset  # needs network

        # one C4 train shard, 1000 random docs (reference: gptq.py:24-35; the
        # legacy "allenai--c4" config name no longer resolves — data_files
        # alone selects the shard on current ``datasets`` releases)
        ds = load_dataset(
            "allenai/c4",
            data_files={"train": "en/c4-train.00000-of-01024.json.gz"}, split="train",
        )
        order = rng.permutation(len(ds))[:1000]
        text = "\n".join(ds[int(i)]["text"] for i in order)
        tokens = tokenizer.encode(text, bos=False)
        starts = rng.integers(0, len(tokens) - block_size, size=n_samples)
        return np.stack([tokens[s : s + block_size] for s in starts]).astype(np.int32)
    except Exception as e:
        print(f"calibration download failed ({e}); using random tokens", file=sys.stderr)
        return rng.integers(0, vocab_size, size=(n_samples, block_size)).astype(np.int32)


def main(
    checkpoint_path: Path = Path("checkpoints/lit-llama/7B/lit-llama.pth"),
    output_path: Optional[Path] = None,
    tokenizer_path: Path = Path("checkpoints/lit-llama/tokenizer.model"),
    n_samples: int = 128,
    block_size: int = 2048,
    groupsize: int = 128,
    batch: int = 4,
    data_file: Optional[Path] = None,
    actorder: bool = False,
) -> None:
    """Blockwise GPTQ int4 quantization of a LLaMA checkpoint.

    Args:
        checkpoint_path: The checkpoint path to load (.pth or native dir).
        output_path: Output checkpoint directory (default: <input>.gptq.int4).
        tokenizer_path: The tokenizer path to load.
        n_samples: Calibration sequences (reference: 128).
        block_size: Calibration sequence length (reference: 2048).
        groupsize: Quantization group size along the input dim (reference: 128).
        batch: Calibration forward batch size.
        data_file: Local calibration text; random tokens if omitted and offline.
        actorder: Quantize rows in descending-diag(H) order (reference: quantization.py:542-545).
    """
    from lit_llama_tpu.data.tokenizer import Tokenizer
    from lit_llama_tpu.quant import gptq
    from lit_llama_tpu.training.loop import _config_meta
    from lit_llama_tpu.utils import checkpoint as ckpt
    from lit_llama_tpu.utils.loader import load_model

    import jax

    checkpoint_path = Path(checkpoint_path)
    if output_path is None:
        output_path = checkpoint_path.parent / (checkpoint_path.stem + ".gptq.int4")
    tokenizer = Tokenizer(tokenizer_path)

    t0 = time.perf_counter()
    params, config = load_model(checkpoint_path, dtype="float32")
    config = config.replace(quant_groupsize=groupsize)
    calib = get_sample_data(
        tokenizer, n_samples, min(block_size, config.block_size), data_file, config.vocab_size
    )
    print(f"loaded model + calib in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    qparams = gptq.quantize_model_gptq(
        params, config, jax.numpy.asarray(calib), groupsize=groupsize, batch=batch,
        actorder=actorder
    )
    print(f"GPTQ done in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    qconfig = config.replace(quantize="int4")
    meta = {"config": _config_meta(qconfig)}
    ckpt.save_checkpoint(
        output_path,
        {"params": jax.tree_util.tree_map(np.asarray, qparams)},
        metadata=meta,
    )
    print(f"quantized checkpoint written to {output_path}")


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(main)
