"""Minimal pretraining demo on tiny-shakespeare
(reference: pretrain/shakespeare.py — 7B-shape config with vocab 100 and
block_size 1024, randint batch sampling from a token memmap).

TPU-native: one {data, model} mesh replaces the FSDPStrategy wrapper; parameter
sharding is a PartitionSpec annotation and activation checkpointing is
``jax.remat`` on the scanned block.
"""

import sys
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

import jax
import jax.numpy as jnp
import numpy as np


def main(
    data_dir: Path = Path("data/shakespeare"),
    out_dir: Path = Path("out/training"),
    model_size: str = "7B",
    block_size: int = 1024,
    vocab_size: int = 100,
    batch_size: int = 2,
    micro_batch_size: int = 2,
    max_iters: int = 600000,
    learning_rate: float = 6e-4,
    eval_interval: int = 2000,
    eval_iters: int = 200,
    log_interval: int = 1,
    data_parallel: int = -1,
    model_parallel: int = 1,
    n_layer: int = None,
    n_embd: int = None,
    n_head: int = None,
    resume: Path = None,
    remat_policy: str = "dots",
    adam_state_dtype: str = "",
) -> None:
    """Pretrain a LLaMA model on tiny-shakespeare.

    Args:
        data_dir: Directory with train.bin / val.bin from prepare_shakespeare.py.
        out_dir: Checkpoint/log output directory.
        model_size: Config preset (7B/13B/30B/65B).
        block_size: Context length (reference: 1024 for shakespeare).
        vocab_size: Tokenizer vocab (reference: 100).
        batch_size: Global batch size.
        micro_batch_size: Per-step microbatch (grad accumulation = batch/micro).
        max_iters: Total optimizer steps.
        learning_rate: Peak AdamW learning rate.
        eval_interval: Validate every N steps.
        eval_iters: Validation batches per eval.
        log_interval: Log every N steps.
        data_parallel: Mesh data-axis size (-1 = all devices / model_parallel).
        model_parallel: Mesh model-axis (tensor parallel) size.
        n_layer: Override layer count (smoke tests).
        n_embd: Override width.
        n_head: Override head count.
        resume: Resume from a native checkpoint directory (restores optimizer + step).
        adam_state_dtype: '' (float32) or 'bfloat16' — low-precision Adam
            moments (halves optimizer-state HBM traffic and footprint).
        remat_policy: 'dots' (save matmul outputs) or 'full' (recompute all;
            fits larger micro-batches — the 0.44B config needs it).
    """
    from lit_llama_tpu import LLaMAConfig, llama
    from lit_llama_tpu.parallel import mesh as mesh_lib, sharding
    from lit_llama_tpu.training import loop as loop_lib, step as step_lib

    overrides = {}
    if n_layer:
        overrides["n_layer"] = n_layer
    if n_embd:
        overrides["n_embd"] = n_embd
    if n_head:
        overrides["n_head"] = n_head
    config = LLaMAConfig.from_name(
        model_size,
        block_size=block_size,
        vocab_size=vocab_size,
        param_dtype="float32",
        compute_dtype="bfloat16",  # bf16-mixed (reference: shakespeare.py:54)
        **overrides,
    )

    train_data = np.memmap(Path(data_dir) / "train.bin", dtype=np.uint16, mode="r")
    val_data = np.memmap(Path(data_dir) / "val.bin", dtype=np.uint16, mode="r")

    mesh = mesh_lib.make_mesh(data=data_parallel, model=model_parallel)
    tc = step_lib.TrainConfig(
        learning_rate=learning_rate, warmup_iters=0, max_iters=max_iters,
        decay_lr=False, adam_state_dtype=adam_state_dtype or None,
    )
    optimizer = step_lib.make_optimizer(tc)

    if resume is not None:
        state = loop_lib.load_train_checkpoint(resume, optimizer)
        state = step_lib.TrainState(
            sharding.shard_params(state.params, mesh, fsdp=True, tp=model_parallel > 1),
            state.opt_state,
            state.step,
        )
    else:
        params = llama.init_params(config, jax.random.PRNGKey(1337))
        params = sharding.shard_params(params, mesh, fsdp=True, tp=model_parallel > 1)
        opt_state = jax.jit(optimizer.init)(params)
        state = step_lib.TrainState(params, opt_state, jnp.int32(0))

    accum = max(1, batch_size // micro_batch_size)
    rng = np.random.default_rng(1337)

    def batches(data):
        # randint block sampling (reference: pretrain/shakespeare.py:152-157)
        while True:
            ix = rng.integers(len(data) - block_size - 1, size=accum * micro_batch_size)
            x = np.stack([data[i : i + block_size].astype(np.int32) for i in ix])
            y = np.stack([data[i + 1 : i + 1 + block_size].astype(np.int32) for i in ix])
            yield (
                x.reshape(accum, micro_batch_size, block_size),
                y.reshape(accum, micro_batch_size, block_size),
            )

    lc = loop_lib.LoopConfig(
        out_dir=Path(out_dir),
        max_iters=max_iters,
        log_interval=log_interval,
        eval_interval=eval_interval,
        eval_iters=eval_iters,
        save_interval=eval_interval,
    )
    with mesh:
        state = loop_lib.train(
            state,
            batches(train_data),
            config,
            optimizer,
            lc,
            validate_fn=loop_lib.validate_on(lambda: batches(val_data), config, eval_iters),
            remat_policy=remat_policy,
        )
        if int(state.step) >= max_iters:
            # only a COMPLETED run earns "final" — a SIGTERM/preempt stop
            # already saved preempt-NNNNNN and must not masquerade as done
            loop_lib.save_train_checkpoint(Path(out_dir), "final", state, config)


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(main)
