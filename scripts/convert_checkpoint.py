"""Convert Meta's original LLaMA weights to the lit-llama layout
(reference: scripts/convert_checkpoint.py — key renames, wq/wk/wv fusion into
c_attn, merging tensor-parallel shards of 13B+ checkpoints)."""

import sys
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def convert_checkpoint(
    output_dir: Path = Path("checkpoints/lit-llama/7B"),
    input_dir: Path = Path("checkpoints/llama/7B"),
    model_size: str = "7B",
    dtype: str = "float32",
) -> None:
    """Convert Meta consolidated.*.pth shards into a single lit-llama.pth.

    Args:
        output_dir: Output directory (writes lit-llama.pth).
        input_dir: Directory with Meta's consolidated.NN.pth shard files.
        model_size: Config preset (7B/13B/30B/65B) — determines shard merging.
        dtype: Output dtype.
    """
    from lit_llama_tpu import LLaMAConfig
    from lit_llama_tpu.utils import convert
    from lit_llama_tpu.utils.pth_reader import load_pth, save_pth

    input_dir, output_dir = Path(input_dir), Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    shard_files = sorted(input_dir.glob("consolidated.*.pth"))
    if not shard_files:
        raise FileNotFoundError(f"no consolidated.*.pth under {input_dir}")
    shards = [load_pth(f) for f in shard_files]
    config = LLaMAConfig.from_name(model_size)
    sd = convert.meta_to_lit(shards, config, dtype=dtype)
    save_pth(output_dir / "lit-llama.pth", sd)
    print(f"written {output_dir / 'lit-llama.pth'}")


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(convert_checkpoint)
