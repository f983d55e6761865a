"""Profile the single-token decode step of the quantized model on the real chip.

Captures a jax.profiler trace of N chained decode steps (cache/token carried
step-to-step, synced with a value fetch — the only timing pattern the axon relay
reports truthfully), then aggregates device-side op durations from the
trace.json.gz by op-name prefix.

Usage:
    python scripts/profile_decode.py --model_size 7B --steps 32 \
        --trace_dir /tmp/decode_trace

Prints a per-op-group table (total us across all steps, us/step, % of step) and
the implied tokens/sec, so kernel work is guided by measurement instead of
guesswork (VERDICT round 1, weak #1/#2).
"""

from __future__ import annotations

import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

import jax
import jax.numpy as jnp

from lit_llama_tpu import LLaMAConfig
from lit_llama_tpu.models import generate as gen
from lit_llama_tpu.models import llama
from lit_llama_tpu.ops.rope import build_rope_cache
from lit_llama_tpu.utils.cli import cli, enable_compilation_cache


def _decode_steps(params, config, rope_cache, tok, pos0, cache, key, n_steps):
    """``n_steps`` chained decode steps as ONE program: per-call dispatch
    through the axon relay costs seconds for a 7B weight tree, so profiling
    per-step calls measures the RPC layer, not the chip. A fori_loop keeps one
    dispatch; the trace still carries every per-op device event inside it."""

    def body(i, carry):
        tok, cache, key = carry
        logits, cache = llama.forward(
            params,
            tok[None, :],
            config,
            rope_cache=rope_cache,
            input_pos=jnp.array([0]) + pos0 + i,
            kv_cache=cache,
            can_overflow=False,  # the profiled window never passes max_seq
        )
        key, sub = jax.random.split(key)
        nxt = gen.sample_logits(logits[0, -1].astype(jnp.float32), sub, 0.8, 200)
        return nxt[None], cache, key

    return jax.lax.fori_loop(0, n_steps, body, (tok, cache, key))


def _decode_steps_fused(params, config, rope_cache, tok, pos0, cache, key, n_steps):
    """The whole-layer fused kernel path (ops/fused_layer.py): one launch per
    block + fused lm_head (33 launches/step at 7B) — params must be prepared
    (half-rotation basis)."""
    from lit_llama_tpu.ops.fused_layer import decode_layer_fused, lm_head_fused
    from lit_llama_tpu.ops.rope import rope_half_row

    S = cache[0]["k"].shape[-2]

    def body(i, carry):
        tok, cache, key = carry
        pos = pos0 + i
        cosf, sinf = rope_half_row(
            rope_cache, jnp.clip(pos, 0, config.block_size - 1), config.head_size
        )
        x = jnp.take(params["wte"], tok, axis=0).astype(
            jnp.dtype(config.compute_dtype)
        )
        new_layers = []
        for lp, kv_l in zip(params["h"], cache):
            x, kv_l = decode_layer_fused(x, lp, kv_l, cosf, sinf, pos % S, pos, config)
            new_layers.append(kv_l)
        logits = lm_head_fused(x, params["ln_f"], params["lm_head"], config)
        key, sub = jax.random.split(key)
        nxt = gen.sample_logits(logits[0].astype(jnp.float32), sub, 0.8, 200)
        return nxt[None], tuple(new_layers), key

    return jax.lax.fori_loop(0, n_steps, body, (tok, cache, key))


def _decode_steps_batched(params, config, rope_cache, toks, pos0, cache, key, n_steps):
    """Continuous-batching shape: B independent slots decoding via ``slot_pos``
    with per-slot sampling — the engine's step (serve/engine.py) without the
    host scheduler, for profiling batch scaling."""
    B = toks.shape[0]

    def body(i, carry):
        toks, cache, key = carry
        logits, cache = llama.forward(
            params,
            toks[:, None],
            config,
            rope_cache=rope_cache,
            slot_pos=jnp.full((B,), 0, jnp.int32) + pos0 + i,
            kv_cache=cache,
        )
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, B)
        nxt = jax.vmap(
            lambda lg, k: gen.sample_logits(lg.astype(jnp.float32), k, 0.8, 200)
        )(logits[:, -1], keys)
        return nxt.astype(jnp.int32), cache, key

    return jax.lax.fori_loop(0, n_steps, body, (toks, cache, key))


def aggregate_trace(trace_dir: Path) -> dict:
    """Sum device-op durations by name from the newest trace.json.gz under
    ``trace_dir``. Returns {name: total_us}."""
    candidates = sorted(trace_dir.glob("**/*.trace.json.gz"), key=lambda p: p.stat().st_mtime)
    if not candidates:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(candidates[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # identify device-side lanes: pids whose process_name mentions TPU/device XLA Ops
    proc_names = {}
    thread_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            proc_names[ev["pid"]] = ev["args"].get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            thread_names[(ev["pid"], ev.get("tid"))] = ev["args"].get("name", "")
    device_pids = {
        pid
        for pid, name in proc_names.items()
        if "TPU" in name or "/device:" in name or "Device" in name
    }
    totals: dict = defaultdict(float)
    counts: dict = defaultdict(int)
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        tname = thread_names.get((ev["pid"], ev.get("tid")), "")
        # XLA op lanes carry per-op events; skip step/module summary lanes
        if "Steps" in tname or "module" in tname.lower():
            continue
        totals[ev["name"]] += ev.get("dur", 0.0)
        counts[ev["name"]] += 1
    return totals, counts, proc_names, thread_names


GROUPS = (
    ("fused layer kernel", ("layer_kernel", "head_kernel", "write_attn", "step_kernel", "pipe_kernel")),
    ("int4 matmul kernel", ("matmul_int4", "int4_kernel")),
    ("int8 matmul kernel", ("matmul_int8", "int8_kernel")),
    ("fusion", ("fusion",)),
    ("dynamic-update-slice (cache write)", ("dynamic-update-slice", "dynamic_update_slice")),
    ("copy / transpose", ("copy", "transpose", "bitcast")),
    ("dot / matvec (XLA)", ("dot", "convolution")),
    ("all-reduce/collective", ("all-reduce", "all-gather", "reduce-scatter", "collective")),
    ("sort/top-k", ("sort", "top-k", "approx")),
)


def run(
    model_size: str = "7B",
    steps: int = 32,
    trace_dir: str = "/tmp/decode_trace",
    max_seq_length: int = 128,
    kv_cache_dtype: str = "bfloat16",
    batch: int = 1,
    stacked_cache: bool = False,
    fused: bool = False,
) -> None:
    """Profile ``steps`` chained decode steps of ``model_size`` int4 on the chip.

    Args:
        batch: 1 profiles the single-stream generate step; >1 profiles the
            serving engine's batched slot_pos step (per-slot positions and
            sampling) to locate the sub-linear batch-scaling cost.
        stacked_cache: keep the (L, ...) stacked KV cache (two full-cache
            copies per step) instead of the per-layer tuple layout, for A/B.
        fused: profile the whole-layer fused kernel path (batch 1 only).
    """
    enable_compilation_cache()
    sys.path.insert(0, str(wd))
    from bench import random_int4_params

    on_accel = jax.default_backend() != "cpu"
    if on_accel:
        config = LLaMAConfig.from_name(
            model_size,
            param_dtype="bfloat16",
            compute_dtype="bfloat16",
            quantize="int4",
            kv_cache_dtype=kv_cache_dtype,
        )
    else:
        config = LLaMAConfig(
            block_size=128, vocab_size=256, n_layer=2, n_head=4, n_embd=64,
            quantize="int4", quant_groupsize=32, kv_cache_dtype=kv_cache_dtype,
        )

    params = jax.jit(random_int4_params, static_argnums=0)(config, jax.random.PRNGKey(0))
    params = llama.unstack_layers(params)
    jax.block_until_ready(params)

    rope_cache = build_rope_cache(config.block_size, config.head_size)
    pack_cache = fused and jnp.dtype(config.compute_dtype) == jnp.bfloat16
    if pack_cache:
        # the fused kernels take bf16 caches only in the packed-u32 layout
        config = config.replace(kv_cache_dtype=None)
    cache = llama.init_kv_cache(config, batch, max_seq_length, packed=pack_cache)
    if not stacked_cache:
        cache = llama.unstack_kv_cache(cache)
    if fused:
        assert batch == 1, "fused path profiles the single-stream step"
        assert config.kv_cache_dtype in (None, "bfloat16"), "fused: bf16 cache only"
        assert config.head_size == 128, "fused path requires head_size 128 (TPU run)"
        from lit_llama_tpu.ops.fused_layer import prepare_fused_params

        params, config = prepare_fused_params(params, config)
        run_steps = jax.jit(_decode_steps_fused, static_argnums=(1, 7))
        tok = jnp.array([5], jnp.int32)
    elif batch > 1:
        run_steps = jax.jit(_decode_steps_batched, static_argnums=(1, 7))
        tok = jnp.full((batch,), 5, jnp.int32)
    else:
        run_steps = jax.jit(_decode_steps, static_argnums=(1, 7))
        tok = jnp.array([5], jnp.int32)
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    tk, _, _ = run_steps(params, config, rope_cache, tok, jnp.int32(1), cache, key, steps)
    _ = int(tk[0])
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # timed, untraced: one dispatch, value-fetch synced
    t0 = time.perf_counter()
    tk, _, _ = run_steps(params, config, rope_cache, tok, jnp.int32(1), cache, key, steps)
    _ = int(tk[0])
    wall = time.perf_counter() - t0
    print(
        f"untraced: {steps} steps in {wall*1e3:.1f} ms -> {steps/wall:.1f} tok/s/slot"
        f" ({batch * steps / wall:.1f} aggregate at batch {batch}), "
        f"{wall/steps*1e3:.3f} ms/step",
        file=sys.stderr,
    )

    tdir = Path(trace_dir)
    jax.profiler.start_trace(str(tdir))
    tk, _, _ = run_steps(params, config, rope_cache, tok, jnp.int32(1), cache, key, steps)
    _ = int(tk[0])
    jax.profiler.stop_trace()

    totals, counts, procs, threads = aggregate_trace(tdir)
    grand = sum(totals.values())
    per_group = defaultdict(float)
    per_group_n = defaultdict(int)
    other_names = defaultdict(float)
    for name, us in totals.items():
        for gname, pats in GROUPS:
            if any(p in name for p in pats):
                per_group[gname] += us
                per_group_n[gname] += counts[name]
                break
        else:
            per_group["other"] += us
            per_group_n["other"] += counts[name]
            other_names[name] += us

    print(f"\ndevice total: {grand/1e3:.2f} ms over {steps} steps "
          f"({grand/steps/1e3:.3f} ms/step device-busy)")
    print(f"{'group':42s} {'total ms':>9s} {'us/step':>9s} {'%':>6s} {'n':>6s}")
    for gname, us in sorted(per_group.items(), key=lambda kv: -kv[1]):
        print(f"{gname:42s} {us/1e3:9.2f} {us/steps:9.1f} {100*us/grand:6.1f} {per_group_n[gname]:6d}")
    print("\ntop 'other' ops:")
    for name, us in sorted(other_names.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {us/steps:8.1f} us/step  {name[:100]}")
    print("\ntop individual ops overall:")
    for name, us in sorted(totals.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {us/steps:8.1f} us/step  n={counts[name]:4d}  {name[:90]}")


if __name__ == "__main__":
    cli(run)
