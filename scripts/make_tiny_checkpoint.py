"""Create a tiny random lit-llama-format checkpoint + tokenizer for smoke tests.

Not part of the reference; exists so the generate/evaluate/finetune CLIs can be
driven end-to-end without downloading real weights (the reference's tests train a
100-token tokenizer inside the test for the same reason, reference:
tests/test_packed_dataset.py:10-30).
"""

import sys
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

import jax
import numpy as np

from lit_llama_tpu import LLaMAConfig
from lit_llama_tpu.data.tokenizer import Tokenizer
from lit_llama_tpu.models import llama
from lit_llama_tpu.utils import convert
from lit_llama_tpu.utils.pth_reader import save_pth


def main(
    out_dir: Path = Path("checkpoints/tiny"),
    vocab_size: int = 256,
    n_layer: int = 2,
    n_head: int = 4,
    n_embd: int = 64,
    block_size: int = 128,
    seed: int = 0,
) -> None:
    """Write <out_dir>/lit-llama.pth, <out_dir>/tokenizer.model and config.json.

    Args:
        out_dir: Output directory.
        vocab_size: Tokenizer/model vocab size.
        n_layer: Number of transformer blocks.
        n_head: Attention heads.
        n_embd: Embedding width.
        block_size: Context length.
        seed: Weight init seed.
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    config = LLaMAConfig(
        block_size=block_size,
        vocab_size=vocab_size,
        n_layer=n_layer,
        n_head=n_head,
        n_embd=n_embd,
    )
    params = llama.init_params(config, jax.random.PRNGKey(seed))
    sd = convert.pytree_to_lit(params, config)
    save_pth(out_dir / "lit-llama.pth", sd)

    corpus = out_dir / "_corpus.txt"
    corpus.write_text(
        "the quick brown fox jumps over the lazy dog\n"
        "pack my box with five dozen liquor jugs\n"
        "how vexingly quick daft zebras jump\n" * 50
    )
    Tokenizer.train(str(corpus), str(out_dir), vocab_size=vocab_size)
    corpus.unlink()
    import json

    (out_dir / "config.json").write_text(
        json.dumps(
            dict(
                block_size=block_size,
                vocab_size=vocab_size,
                n_layer=n_layer,
                n_head=n_head,
                n_embd=n_embd,
            )
        )
    )
    print(f"tiny checkpoint written to {out_dir}")


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(main)
