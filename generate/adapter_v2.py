"""Generate with Adapter v2 weights overlaid on a base checkpoint
(reference: generate/adapter_v2.py — adds the linear bias/scale params before
loading the adapter state).

Same flow as generate/adapter.py with the v2 parameter set; the sibling script
is loaded by path because ``generate`` is shadowed by the top-level generate.py
module (the reference has the same layout).
"""

import importlib.util
import sys
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

_spec = importlib.util.spec_from_file_location(
    "_generate_adapter", Path(__file__).parent / "adapter.py"
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
_mod.ADAPTER_V2 = True


def main(
    prompt: str = "What food do lamas eat?",
    input: str = "",
    adapter_path: Path = Path("out/adapter_v2/alpaca/lit-llama-adapter-v2-finetuned"),
    checkpoint_path: Path = Path("checkpoints/lit-llama/7B/lit-llama.pth"),
    tokenizer_path: Path = Path("checkpoints/lit-llama/tokenizer.model"),
    quantize: Optional[str] = None,
    max_new_tokens: int = 100,
    top_k: int = 200,
    temperature: float = 0.8,
    seed: int = 1234,
) -> None:
    """Generates a response based on a given instruction with an Adapter v2 overlay.

    Args:
        prompt: The instruction string.
        input: Optional input for the instruction template.
        adapter_path: Adapter v2 checkpoint directory (from finetune/adapter_v2.py).
        checkpoint_path: The base model checkpoint (.pth or native dir).
        tokenizer_path: The tokenizer path to load.
        quantize: Quantize the BASE weights at load: "llm.int8" or
            "gptq.int4" (the adapter weights stay dense, applied on top).
        max_new_tokens: The number of generation steps to take.
        top_k: The number of top most probable tokens to consider in the sampling process.
        temperature: A value controlling the randomness of the sampling process.
        seed: Random seed for sampling.
    """
    _mod.main(
        prompt=prompt,
        input=input,
        adapter_path=adapter_path,
        checkpoint_path=checkpoint_path,
        tokenizer_path=tokenizer_path,
        quantize=quantize,
        max_new_tokens=max_new_tokens,
        top_k=top_k,
        temperature=temperature,
        seed=seed,
    )


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(main)
