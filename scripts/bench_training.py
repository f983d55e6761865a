"""Training-step throughput benchmark: tokens/sec for a given model config on
the available devices (dp × tp mesh), with activation rematerialization.

The reference's equivalent signal is the tokens/sec print in its train loop
(pretrain/redpajama.py:199-207); this isolates the jitted step.
"""

import sys
import time
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

import numpy as np


def main(
    model_size: str = "7B",
    n_layer: int = 8,
    n_embd: int = 2048,
    n_head: int = 16,
    block_size: int = 2048,
    vocab_size: int = 32000,
    micro_batch_size: int = 1,
    accum_steps: int = 1,
    n_iters: int = 5,
    data_parallel: int = -1,
    model_parallel: int = 1,
    remat: bool = True,
    remat_policy: str = "dots",
    adam_state_dtype: str = "",
    trace_dir: str = "",
) -> None:
    """Benchmark the jitted training step.

    Args:
        model_size: Preset; dimension overrides below take precedence.
        n_layer: Layer count (default sized to fit one v5e chip with Adam).
        n_embd: Width.
        n_head: Heads.
        block_size: Sequence length.
        vocab_size: Vocabulary size.
        micro_batch_size: Per-step microbatch.
        accum_steps: Gradient accumulation microsteps.
        n_iters: Timed iterations.
        data_parallel: Mesh data-axis size.
        model_parallel: Mesh model-axis size.
        remat: Activation rematerialization on the scanned block.
        remat_policy: 'dots' (save matmul outputs) or 'full' (recompute all).
        adam_state_dtype: '' (float32) or 'bfloat16' — halves optimizer-state
            HBM traffic (the 0.44B step measured ~15.7 ms of Adam state moves).
        trace_dir: If set, capture a jax.profiler trace of the timed iters and
            print the per-op-group device breakdown (guides MFU work).
    """
    import jax
    import jax.numpy as jnp

    from lit_llama_tpu import LLaMAConfig, llama
    from lit_llama_tpu.parallel import mesh as mesh_lib, sharding
    from lit_llama_tpu.training import step as step_lib

    config = LLaMAConfig.from_name(
        model_size,
        n_layer=n_layer,
        n_embd=n_embd,
        n_head=n_head,
        block_size=block_size,
        vocab_size=vocab_size,
        param_dtype="float32",
        compute_dtype="bfloat16",
    )
    n_params = (
        config.padded_vocab_size * config.n_embd * 2
        + config.n_layer
        * (4 * config.n_embd**2 + 3 * config.n_embd * config.intermediate_size)
    )
    print(f"~{n_params/1e9:.2f}B params", file=sys.stderr)

    mesh = mesh_lib.make_mesh(data=data_parallel, model=model_parallel)
    n_dev = mesh.devices.size
    params = llama.init_params(config, jax.random.PRNGKey(0))
    if n_dev > 1:
        params = sharding.shard_params(params, mesh, fsdp=True, tp=model_parallel > 1)
    tc = step_lib.TrainConfig(
        warmup_iters=0, max_iters=10**6, decay_lr=False,
        adam_state_dtype=adam_state_dtype or None,
    )
    optimizer = step_lib.make_optimizer(tc)
    opt_state = jax.jit(optimizer.init)(params)
    state = step_lib.TrainState(params, opt_state, jnp.int32(0))

    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        rng.integers(0, vocab_size, size=(accum_steps, micro_batch_size, block_size)),
        jnp.int32,
    )

    with mesh:
        t0 = time.perf_counter()
        state, loss = step_lib.train_step(
            state, ids, ids, config, optimizer, remat, remat_policy
        )
        float(loss)  # value fetch — block_until_ready alone can return early on
        # remote-attached (relay) devices
        compile_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in range(n_iters):
            state, loss = step_lib.train_step(
            state, ids, ids, config, optimizer, remat, remat_policy
        )
        float(loss)
        dt = (time.perf_counter() - t0) / n_iters

    tokens = accum_steps * micro_batch_size * block_size
    flops = 6 * n_params * tokens  # fwd+bwd estimate
    print(
        f"step {dt*1e3:.1f} ms, {tokens/dt:,.0f} tokens/sec, "
        f"~{flops/dt/1e12:.1f} TFLOP/s (compile {compile_s:.1f}s, loss {float(loss):.3f})"
    )

    if trace_dir:
        sys.path.insert(0, str(wd / "scripts"))
        from profile_decode import aggregate_trace

        with mesh:
            jax.profiler.start_trace(trace_dir)
            for _ in range(n_iters):
                state, loss = step_lib.train_step(
                    state, ids, ids, config, optimizer, remat, remat_policy
                )
            float(loss)
            jax.profiler.stop_trace()
        totals, counts, _, _ = aggregate_trace(Path(trace_dir))
        grand = sum(v for k, v in totals.items() if not k.startswith("while"))
        print(f"device ops total {grand/n_iters/1e3:.1f} ms/step; top ops:")
        for name, us in sorted(totals.items(), key=lambda kv: -kv[1])[:25]:
            print(f"  {us/n_iters/1e3:8.2f} ms/step  n={counts[name]//n_iters:4d}  {name[:90]}")


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(main)
