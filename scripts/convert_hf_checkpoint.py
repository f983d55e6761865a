"""Convert HuggingFace LLaMA weights to the lit-llama layout
(reference: scripts/convert_hf_checkpoint.py — weight_map renames, un-permuting
the rotary q/k layout, fusing q/k/v into c_attn across split bin files)."""

import sys
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def convert_hf_checkpoint(
    output_dir: Path = Path("checkpoints/lit-llama/7B"),
    checkpoint_dir: Path = Path("checkpoints/hf-llama/7B"),
    model_size: str = "7B",
    dtype: str = "float32",
    verify: bool = False,
) -> None:
    """Convert HF pytorch_model*.bin files into a single lit-llama.pth.

    Args:
        output_dir: Output directory (writes lit-llama.pth).
        checkpoint_dir: Directory with HF pytorch_model*.bin files.
        model_size: Config preset (7B/13B/30B/65B).
        dtype: Output dtype.
        verify: Run a logits-parity check against transformers (needs torch weights).
    """
    from lit_llama_tpu import LLaMAConfig
    from lit_llama_tpu.utils import convert
    from lit_llama_tpu.utils.pth_reader import load_pth, save_pth

    checkpoint_dir, output_dir = Path(checkpoint_dir), Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    bins = sorted(checkpoint_dir.glob("*.bin"))
    if not bins:
        raise FileNotFoundError(f"no .bin files under {checkpoint_dir}")
    config = LLaMAConfig.from_name(model_size)
    merged = {}
    for b in bins:
        merged.update(load_pth(b))
    sd = convert.hf_to_lit(merged, config)
    save_pth(output_dir / "lit-llama.pth", sd)
    print(f"written {output_dir / 'lit-llama.pth'}")

    if verify:
        _verify(output_dir / "lit-llama.pth", checkpoint_dir, config)


def _verify(lit_path: Path, hf_dir: Path, config) -> None:
    """Logits parity vs transformers (reference: convert_hf_checkpoint.py:143-162)."""
    import numpy as np
    import torch
    from transformers import LlamaForCausalLM

    import jax.numpy as jnp

    from lit_llama_tpu.models import llama
    from lit_llama_tpu.utils import convert
    from lit_llama_tpu.utils.pth_reader import load_pth

    token_sample = np.random.default_rng(0).integers(
        0, config.vocab_size, size=(1, 32)
    ).astype(np.int32)
    params = convert.lit_to_pytree(load_pth(lit_path), config, dtype="float32")
    ours, _ = llama.forward(params, jnp.asarray(token_sample), config)

    model = LlamaForCausalLM.from_pretrained(hf_dir, torch_dtype=torch.float32)
    with torch.no_grad():
        theirs = model(torch.from_numpy(token_sample).long())["logits"]
    np.testing.assert_allclose(
        np.asarray(ours)[..., : config.vocab_size],
        theirs.numpy(),
        atol=2e-3,
        rtol=2e-3,
    )
    print("verify: logits match transformers")


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(convert_hf_checkpoint)
