"""Pretrain LLaMA on RedPajama (reference: pretrain/redpajama.py — the real
pretraining loop: PackedDataset + CombinedDataset with the LLaMA-paper mixture,
warmup-cosine LR, grad accumulation, clip 1.0, periodic validate/save).

TPU-native: one {data, model} mesh; FSDP-equivalent parameter sharding and
jax.remat activation checkpointing replace the FSDPStrategy wrapper
(reference :70-75); dataset rank-sharding uses the mesh's data-axis coordinates
(reference passes fabric.global_rank, :250).
"""

import glob
import sys
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

import jax
import jax.numpy as jnp
import numpy as np

# Data proportions from the LLaMA paper, Table 1 (reference: redpajama.py:54-62)
data_config = [
    ("arxiv", 2.5),
    ("book", 4.5),
    ("c4", 15.0),
    ("cc", 67.0),
    ("github", 4.5),
    ("stackexchange", 2.0),
    ("wikipedia", 4.5),
]


def create_dataloader(
    data_dir: Path,
    block_size: int,
    accum: int,
    micro_batch_size: int,
    seed: int,
    num_processes: int,
    process_rank: int,
    shuffle: bool = True,
):
    """Weighted mixture of per-source PackedDatasets
    (reference: create_dataloaders, redpajama.py:237-298)."""
    from lit_llama_tpu.data.packed_dataset import (
        CombinedDataset,
        PackedDataset,
        batcher,
    )

    datasets = []
    weights = []
    for prefix, weight in data_config:
        filenames = sorted(glob.glob(str(Path(data_dir) / f"{prefix}*")))
        if not filenames:
            continue
        datasets.append(
            PackedDataset(
                filenames,
                n_chunks=4,
                block_size=block_size,
                shuffle=shuffle,
                seed=seed,
                num_processes=num_processes,
                process_rank=process_rank,
                wrap=True,
            )
        )
        weights.append(weight)
    if not datasets:
        raise RuntimeError(f"No data found at {data_dir}. Run scripts/prepare_redpajama.py first.")
    weights = [w / sum(weights) for w in weights]
    combined = CombinedDataset(datasets, seed=seed, weights=weights)

    def gen():
        for arr in batcher(combined, micro_batch_size, accum):
            # block is 2049 tokens -> (input, shifted target) of 2048
            yield arr[..., :-1], arr[..., 1:]

    return gen


def main(
    train_data_dir: Path = Path("data/red_pajama_sample"),
    val_data_dir: Path = None,
    out_dir: Path = Path("out/training"),
    model_size: str = "7B",
    batch_size: int = 125,
    micro_batch_size: int = 5,
    max_iters: int = 600000,
    learning_rate: float = 6e-4,
    min_lr: float = 6e-5,
    warmup_iters: int = 2000,
    save_interval: int = 1000,
    eval_interval: int = 1000,
    eval_iters: int = 100,
    log_interval: int = 1,
    data_parallel: int = -1,
    model_parallel: int = 1,
    n_layer: int = None,
    n_embd: int = None,
    n_head: int = None,
    block_size: int = None,
    vocab_size: int = None,
    resume: Path = None,
    profile_at_iter: int = -1,
    adam_state_dtype: str = "",
    remat_policy: str = "dots",
) -> None:
    """Pretrain LLaMA on the RedPajama dataset.

    Args:
        train_data_dir: Directory of LITPKDS chunk files (from prepare_redpajama.py).
        val_data_dir: Optional validation chunk directory.
        out_dir: Checkpoint/log output directory.
        model_size: Config preset (7B/13B/30B/65B).
        batch_size: Global batch size (reference: 125).
        micro_batch_size: Per-step microbatch (reference: 5).
        max_iters: Total optimizer steps (reference: 600k).
        learning_rate: Peak AdamW learning rate.
        min_lr: Final cosine-decayed learning rate.
        warmup_iters: Linear warmup steps (reference: 2000).
        save_interval: Checkpoint every N steps.
        eval_interval: Validate every N steps.
        eval_iters: Validation batches per eval.
        log_interval: Log every N steps.
        data_parallel: Mesh data-axis size (-1 = all devices / model_parallel).
        model_parallel: Mesh model-axis (tensor parallel) size.
        n_layer: Override layer count (smoke tests).
        n_embd: Override width.
        n_head: Override head count.
        block_size: Override context length.
        vocab_size: Override vocab size.
        resume: Resume from a native checkpoint directory (restores optimizer + step).
        profile_at_iter: Capture a jax.profiler trace at this iteration.
        adam_state_dtype: '' (float32) or 'bfloat16' — low-precision Adam
            moments, halving optimizer-state memory and HBM traffic.
        remat_policy: 'dots' (save matmul outputs) or 'full' (recompute all;
            fits larger micro-batches).
    """
    from lit_llama_tpu import LLaMAConfig, llama
    from lit_llama_tpu.parallel import mesh as mesh_lib, sharding
    from lit_llama_tpu.training import loop as loop_lib, step as step_lib

    overrides = {}
    for k, v in (
        ("n_layer", n_layer),
        ("n_embd", n_embd),
        ("n_head", n_head),
        ("block_size", block_size),
        ("vocab_size", vocab_size),
    ):
        if v:
            overrides[k] = v
    config = LLaMAConfig.from_name(
        model_size, param_dtype="float32", compute_dtype="bfloat16", **overrides
    )

    mesh = mesh_lib.make_mesh(data=data_parallel, model=model_parallel)
    n_data = mesh.shape[mesh_lib.DATA_AXIS]
    proc_idx = jax.process_index()
    n_proc = jax.process_count()

    accum = max(1, batch_size // micro_batch_size)
    train_gen = create_dataloader(
        train_data_dir,
        config.block_size + 1,
        accum,
        micro_batch_size,
        seed=1338,
        num_processes=n_proc,
        process_rank=proc_idx,
    )

    tc = step_lib.TrainConfig(
        learning_rate=learning_rate,
        min_lr=min_lr,
        warmup_iters=warmup_iters,
        max_iters=max_iters,
        adam_state_dtype=adam_state_dtype or None,
    )
    optimizer = step_lib.make_optimizer(tc)

    if resume is not None:
        state = loop_lib.load_train_checkpoint(resume, optimizer)
    else:
        params = llama.init_params(config, jax.random.PRNGKey(1337))
        params = sharding.shard_params(params, mesh, fsdp=True, tp=model_parallel > 1)
        opt_state = jax.jit(optimizer.init)(params)
        state = step_lib.TrainState(params, opt_state, jnp.int32(0))

    validate_fn = None
    if val_data_dir is not None:
        val_gen = create_dataloader(
            val_data_dir,
            config.block_size + 1,
            1,
            micro_batch_size,
            seed=3424,
            num_processes=n_proc,
            process_rank=proc_idx,
        )
        validate_fn = loop_lib.validate_on(val_gen, config, eval_iters)

    lc = loop_lib.LoopConfig(
        out_dir=Path(out_dir),
        max_iters=max_iters,
        log_interval=log_interval,
        eval_interval=eval_interval if validate_fn else 0,
        eval_iters=eval_iters,
        save_interval=save_interval,
        profile_at_iter=profile_at_iter,
    )
    with mesh:
        state = loop_lib.train(
            state, train_gen(), config, optimizer, lc, validate_fn=validate_fn,
            remat_policy=remat_policy,
        )
        if int(state.step) >= max_iters:
            # only a COMPLETED run earns "final" — a SIGTERM/preempt stop
            # already saved preempt-NNNNNN and must not masquerade as done
            loop_lib.save_train_checkpoint(Path(out_dir), "final", state, config)


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(main)
