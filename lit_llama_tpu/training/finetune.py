"""Shared finetune driver for full / LoRA / Adapter v1 / Adapter v2.

The reference repeats one skeleton across four scripts (finetune/full.py,
lora.py, adapter.py, adapter_v2.py): load base weights, attach/mark trainables,
alpaca batches with right padding, accumulate/step, validate with a sample
generation, save (PEFT-filtered) checkpoints. This module is that skeleton once;
the finetune/*.py CLIs only choose the mode and hyperparameters.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lit_llama_tpu.data import sft
from lit_llama_tpu.data.tokenizer import Tokenizer
from lit_llama_tpu.models import generate as gen
from lit_llama_tpu.models.config import AdapterConfig, LLaMAConfig, LoRAConfig
from lit_llama_tpu.parallel import mesh as mesh_lib, sharding
from lit_llama_tpu.peft import adapter as adapter_mod
from lit_llama_tpu.peft import lora as lora_mod
from lit_llama_tpu.training import loop as loop_lib, step as step_lib
from lit_llama_tpu.utils.loader import load_model

MODES = ("full", "lora", "adapter", "adapter_v2")


def run(
    mode: str,
    data_dir: Path,
    checkpoint_path: Path,
    tokenizer_path: Path,
    out_dir: Path,
    *,
    learning_rate: float,
    weight_decay: float,
    batch_size: int,
    micro_batch_size: int,
    max_iters: int,
    warmup_iters: int,
    eval_interval: int,
    eval_iters: int,
    save_interval: int,
    log_interval: int,
    max_seq_length: int,
    lora_r: int = 8,
    lora_alpha: float = 16.0,
    lora_dropout: float = 0.05,
    data_parallel: int = -1,
    model_parallel: int = 1,
    seed: int = 1337,
    group_by_length: bool = False,
) -> None:
    assert mode in MODES, mode
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    params, config = load_model(checkpoint_path)
    if mode == "full":
        # bf16-mixed: fp32 master params, bf16 compute (reference full.py FSDP)
        config = config.replace(param_dtype="float32", compute_dtype="bfloat16")
        params = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), params)
    if mode == "lora":
        config = config.replace(
            lora=LoRAConfig(r=lora_r, alpha=lora_alpha, dropout=lora_dropout)
        )
        params = lora_mod.add_lora_params(params, config, jax.random.PRNGKey(seed))
    elif mode in ("adapter", "adapter_v2"):
        config = config.replace(adapter=AdapterConfig(v2=mode == "adapter_v2"))
        params = adapter_mod.add_adapter_params(params, config)

    if mode == "full":
        mask = None
        save_filter = None
    elif mode == "lora":
        mask = lora_mod.trainable_mask(params)
        save_filter = lora_mod.lora_state
    else:
        v2 = mode == "adapter_v2"
        mask = adapter_mod.trainable_mask(params, v2=v2)
        save_filter = lambda p: adapter_mod.adapter_state(p, v2=v2)

    if mask is not None:
        n_train = sum(
            int(np.prod(p.shape))
            for p, m in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(mask))
            if m
        )
        print(f"Number of trainable parameters: {n_train}", file=sys.stderr)

    mesh = mesh_lib.make_mesh(data=data_parallel, model=model_parallel)
    params = sharding.shard_params(
        params, mesh, fsdp=mode == "full", tp=model_parallel > 1
    )

    tc = step_lib.TrainConfig(
        learning_rate=learning_rate,
        weight_decay=weight_decay,
        warmup_iters=warmup_iters,
        max_iters=max_iters,
        min_lr=learning_rate / 10,
    )
    optimizer = step_lib.make_optimizer(tc, trainable_mask=mask)
    opt_state = jax.jit(optimizer.init)(params)
    state = step_lib.TrainState(params, opt_state, jnp.int32(0))

    train_data = sft.load_samples(Path(data_dir) / "train.pt")
    test_data = sft.load_samples(Path(data_dir) / "test.pt")
    tokenizer = Tokenizer(tokenizer_path)

    accum = max(1, batch_size // micro_batch_size)
    rng = np.random.default_rng(seed)

    if group_by_length:
        # near-equal-length batches minimize padding waste (reference:
        # LengthGroupedSampler, finetune/length_grouped_sampler.py:26-101)
        lengths = [len(s["input_ids"]) for s in train_data]

        def batches():
            while True:
                order = sft.length_grouped_indices(lengths, micro_batch_size, rng)
                for i in range(0, len(order) - accum * micro_batch_size + 1, accum * micro_batch_size):
                    chunk = [train_data[j] for j in order[i : i + accum * micro_batch_size]]
                    yield sft.get_batch(
                        chunk,
                        micro_batch_size,
                        np.random.default_rng(0),
                        accum,
                        max_seq_length=max_seq_length,
                        sequential=True,
                    )

    else:

        def batches():
            while True:
                yield sft.get_batch(
                    train_data, micro_batch_size, rng, accum, max_seq_length=max_seq_length
                )

    val_rng = np.random.default_rng(seed + 1)

    def val_batches():
        while True:
            yield sft.get_batch(
                test_data, micro_batch_size, val_rng, 1, max_seq_length=max_seq_length
            )

    base_validate = loop_lib.validate_on(val_batches, config, eval_iters)

    def validate(st):
        val = base_validate(st)
        # sample generation, as the reference's validate does
        # (finetune/lora.py:179-183)
        instruction = "Recommend a movie for me to watch during the weekend and explain the reason."
        prompt = sft.generate_prompt({"instruction": instruction, "input": ""})
        # clamp to the model context so tiny smoke configs can still sample
        encoded = tokenizer.encode(
            prompt, bos=True, eos=False, max_length=max(config.block_size // 2, 8)
        )
        max_new = min(100, config.block_size - len(encoded))
        t0 = time.perf_counter()
        y = gen.generate(
            st.params,
            encoded,
            max_new,
            config=config,
            temperature=0.8,
            top_k=200,
            eos_id=tokenizer.eos_id,
            key=jax.random.PRNGKey(int(st.step)),
        )
        print(tokenizer.decode(y), file=sys.stderr)
        print(f"(sample took {time.perf_counter() - t0:.1f}s)", file=sys.stderr)
        return val

    lc = loop_lib.LoopConfig(
        out_dir=out_dir,
        max_iters=max_iters,
        log_interval=log_interval,
        eval_interval=eval_interval,
        eval_iters=eval_iters,
        save_interval=save_interval,
        save_filter=save_filter,
    )
    with mesh:
        state = loop_lib.train(
            state, batches(), config, optimizer, lc, validate_fn=validate
        )
        name = {
            "full": "lit-llama-full-finetuned",
            "lora": "lit-llama-lora-finetuned",
            "adapter": "lit-llama-adapter-finetuned",
            "adapter_v2": "lit-llama-adapter-v2-finetuned",
        }[mode]
        if int(state.step) >= max_iters:
            # a preempted run saved preempt-NNNNNN; don't publish it as done
            loop_lib.save_train_checkpoint(out_dir, name, state, config, save_filter)
