"""Instruction-tuning (SFT) data: prompt template, tokenization, batching.

Parity with the reference's alpaca pipeline (scripts/prepare_alpaca.py:77-127,
finetune/full.py:195-230): the ``### Instruction:/### Input:/### Response:``
template, input-masked labels (IGNORE_INDEX = -1), right-padded batches
(inputs pad 0, labels pad -1).

TPU-first: batch lengths are bucketed to a multiple of ``pad_multiple`` so the
jitted train step compiles once per bucket instead of once per max-length
(reference pads to the exact batch max, which would retrace XLA every step).

Files: ``.pt`` datasets written by the reference load directly (via torch,
which is host-side only here); our own writes use ``.npz`` (offset-indexed, no
pickle) unless a ``.pt`` path is given.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from lit_llama_tpu.data.tokenizer import Tokenizer

IGNORE_INDEX = -1


def generate_prompt(example: dict) -> str:
    """Standardized instruction prompt (reference: prepare_alpaca.py:113-127)."""
    if example.get("input"):
        return (
            "Below is an instruction that describes a task, paired with an input that provides further context. "
            "Write a response that appropriately completes the request.\n\n"
            f"### Instruction:\n{example['instruction']}\n\n### Input:\n{example['input']}\n\n### Response:"
        )
    return (
        "Below is an instruction that describes a task. "
        "Write a response that appropriately completes the request.\n\n"
        f"### Instruction:\n{example['instruction']}\n\n### Response:"
    )


def prepare_sample(
    example: dict, tokenizer: Tokenizer, max_length: int, mask_inputs: bool = True
) -> Dict[str, np.ndarray]:
    """Tokenize one instruction example; optionally mask the prompt out of the
    labels (reference: prepare_alpaca.py:77-106)."""
    full_prompt = generate_prompt(example)
    full = full_prompt + example["output"]
    enc_prompt = tokenizer.encode(full_prompt, bos=True, eos=False, max_length=max_length)
    enc_full = tokenizer.encode(full, bos=True, eos=True, max_length=max_length)
    labels = enc_full.copy()
    if mask_inputs:
        labels[: len(enc_prompt)] = IGNORE_INDEX
    return {
        "input_ids": enc_full.astype(np.int32),
        "input_ids_no_response": enc_prompt.astype(np.int32),
        "labels": labels.astype(np.int32),
    }


def save_samples(samples: List[Dict[str, np.ndarray]], path) -> None:
    path = Path(path)
    if path.suffix == ".pt":
        import torch

        torch.save(
            [
                {k: torch.from_numpy(np.asarray(v)) for k, v in s.items() if isinstance(v, np.ndarray)}
                for s in samples
            ],
            path,
        )
        return
    flat = {}
    for key in ("input_ids", "input_ids_no_response", "labels"):
        arrs = [np.asarray(s[key]) for s in samples]
        flat[f"{key}_cat"] = np.concatenate(arrs) if arrs else np.zeros(0, np.int32)
        flat[f"{key}_len"] = np.asarray([len(a) for a in arrs], np.int64)
    np.savez(path, **flat)


def load_samples(path) -> List[Dict[str, np.ndarray]]:
    path = Path(path)
    if path.suffix == ".pt":
        import torch

        data = torch.load(path, map_location="cpu", weights_only=False)
        return [
            {
                k: v.numpy().astype(np.int32)
                for k, v in s.items()
                if hasattr(v, "numpy")
            }
            for s in data
        ]
    z = np.load(path if path.suffix == ".npz" else str(path) + ".npz")
    out: List[Dict[str, np.ndarray]] = []
    keys = ("input_ids", "input_ids_no_response", "labels")
    lens = {k: z[f"{k}_len"] for k in keys if f"{k}_len" in z}
    n = len(next(iter(lens.values())))
    offs = {k: np.concatenate([[0], np.cumsum(v)]) for k, v in lens.items()}
    for i in range(n):
        out.append(
            {
                k: z[f"{k}_cat"][offs[k][i] : offs[k][i + 1]].astype(np.int32)
                for k in lens
            }
        )
    return out


def get_batch(
    data: List[Dict[str, np.ndarray]],
    batch_size: int,
    rng: np.random.Generator,
    accum_steps: int = 1,
    pad_multiple: int = 64,
    max_seq_length: Optional[int] = None,
    sequential: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sample a right-padded (accum, batch, T) pair of (input_ids, labels)
    (reference: finetune/full.py:201-217; inputs pad 0, labels pad -1).

    The pair comes out next-token aligned: inputs drop the final token and
    labels drop the first, so ``labels[t]`` is the token that follows
    ``input_ids[t]`` (the reference shifts inside its loss_fn instead,
    finetune/full.py:193-198 — same objective, applied at the data layer here
    to match the pretrain paths, which also shift at the data layer).

    T is the batch max length rounded up to ``pad_multiple`` — a small, fixed
    set of compiled shapes instead of one per max-length.
    """
    n = accum_steps * batch_size
    # sequential: caller already ordered `data` (length-grouped batching)
    ix = np.arange(n) % len(data) if sequential else rng.integers(len(data), size=n)
    input_ids = [data[i]["input_ids"][:-1] for i in ix]
    labels = [data[i]["labels"][1:] for i in ix]
    max_len = max(max(len(s) for s in input_ids), 1)
    T = -(-max_len // pad_multiple) * pad_multiple
    if max_seq_length is not None:
        T = min(T, max_seq_length)
    x = np.zeros((n, T), np.int32)
    y = np.full((n, T), IGNORE_INDEX, np.int32)
    for j, (ids, lab) in enumerate(zip(input_ids, labels)):
        L = min(len(ids), T)
        x[j, :L] = ids[:L]
        y[j, :L] = lab[:L]
    return (
        x.reshape(accum_steps, batch_size, T),
        y.reshape(accum_steps, batch_size, T),
    )


def length_grouped_indices(
    lengths: List[int], batch_size: int, rng: np.random.Generator, mega_factor: int = 50
) -> np.ndarray:
    """Random permutation -> megabatches -> sort by length inside each; the
    globally longest example is placed first to surface OOM immediately
    (reference: finetune/length_grouped_sampler.py:26-101)."""
    n = len(lengths)
    perm = rng.permutation(n)
    mega = batch_size * mega_factor
    chunks = [perm[i : i + mega] for i in range(0, n, mega)]
    chunks = [
        c[np.argsort(-np.asarray([lengths[i] for i in c]), kind="stable")] for c in chunks
    ]
    if chunks:
        # move the global longest to the very front
        maxes = [int(c[0]) for c in chunks]
        best_chunk = int(np.argmax([lengths[m] for m in maxes]))
        c0 = chunks[0].copy()
        cb = chunks[best_chunk].copy()
        c0[0], cb[0] = cb[0], c0[0]
        chunks[0], chunks[best_chunk] = c0, cb
    return np.concatenate(chunks) if chunks else np.zeros(0, np.int64)
