"""Training step: loss, optimizer, gradient accumulation, clipping — one jitted fn.

Capability parity with the reference's training skeleton (pretrain/redpajama.py:126-214):
cosine LR with warmup (:302-313), gradient accumulation (``no_backward_sync`` :159-166),
global-norm clip 1.0 (:171), AdamW(β=0.9/0.95, wd=0.1) (:44-49, :110-116).

TPU-first: accumulation is a ``lax.scan`` over microbatches inside ONE compiled
step — there is no gradient sync to skip under SPMD; the psum happens once when
XLA reduces the scanned gradients. Activation checkpointing is ``jax.checkpoint``
on the scanned Block body (llama.forward(remat=True)), replacing FSDP's
activation_checkpointing={Block} wrapper.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from lit_llama_tpu.models import llama
from lit_llama_tpu.models.config import LLaMAConfig

Params = Dict[str, Any]

IGNORE_INDEX = -1  # label value excluded from the loss (reference: scripts/prepare_alpaca.py:31)


@dataclass(frozen=True)
class TrainConfig:
    """Optimizer/schedule hyperparameters (reference: pretrain/redpajama.py:39-50)."""

    learning_rate: float = 6e-4
    weight_decay: float = 0.1
    beta1: float = 0.9
    beta2: float = 0.95
    grad_clip: float = 1.0
    warmup_iters: int = 2000
    max_iters: int = 600000
    min_lr: float = 6e-5
    decay_lr: bool = True
    # Storage dtype for the Adam moments (None = float32). "bfloat16" halves
    # the optimizer-state HBM traffic — the 0.44B bench measured ~15.7 ms of
    # a step moving 12 GB of fp32 Adam state (TPU-first: the optimizer update
    # is bandwidth-bound, not compute-bound). The EMA update itself still
    # runs in float32; only the carried state rounds, and with
    # (1-beta2) = 0.05 the per-step increments sit ~7 bits above bf16's
    # rounding floor.
    adam_state_dtype: Optional[str] = None


class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def cosine_lr(tc: TrainConfig):
    """Warmup + cosine decay to min_lr (reference: pretrain/redpajama.py:302-313)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = tc.learning_rate * step / jnp.maximum(tc.warmup_iters, 1)
        if not tc.decay_lr:
            return jnp.where(step < tc.warmup_iters, warm, tc.learning_rate)
        decay_ratio = (step - tc.warmup_iters) / jnp.maximum(
            tc.max_iters - tc.warmup_iters, 1
        )
        decay_ratio = jnp.clip(decay_ratio, 0.0, 1.0)
        coeff = 0.5 * (1.0 + jnp.cos(math.pi * decay_ratio))
        cos = tc.min_lr + coeff * (tc.learning_rate - tc.min_lr)
        return jnp.where(step < tc.warmup_iters, warm, cos)

    return schedule


def scale_by_adam_lowp(
    b1: float, b2: float, eps: float = 1e-8, state_dtype=jnp.bfloat16
) -> optax.GradientTransformation:
    """Adam moments carried in ``state_dtype`` (optax's mu_dtype covers only
    the first moment). The EMA math runs in float32 each step; the moments
    round to ``state_dtype`` only when stored."""

    def init(params):
        zeros = lambda p: jnp.zeros(p.shape, state_dtype)  # noqa: E731
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update(updates, state, params=None):
        del params
        f32 = jnp.float32
        mu32 = jax.tree_util.tree_map(
            lambda m, g: b1 * m.astype(f32) + (1 - b1) * g.astype(f32),
            state.mu, updates,
        )
        nu32 = jax.tree_util.tree_map(
            lambda v, g: b2 * v.astype(f32) + (1 - b2) * jnp.square(g.astype(f32)),
            state.nu, updates,
        )
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(f32)
        bc2 = 1.0 - b2 ** count.astype(f32)
        out = jax.tree_util.tree_map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu32, nu32
        )
        store = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda x: x.astype(state_dtype), t
        )
        return out, optax.ScaleByAdamState(count=count, mu=store(mu32), nu=store(nu32))

    return optax.GradientTransformation(init, update)


def make_optimizer(tc: TrainConfig, trainable_mask=None) -> optax.GradientTransformation:
    """AdamW with global-norm clip; ``trainable_mask`` freezes params for PEFT
    (replaces ``mark_only_lora_as_trainable``, reference: lora.py:329-345)."""
    if tc.adam_state_dtype:
        adam = scale_by_adam_lowp(
            tc.beta1, tc.beta2, state_dtype=jnp.dtype(tc.adam_state_dtype)
        )
    else:
        adam = optax.scale_by_adam(b1=tc.beta1, b2=tc.beta2)
    chain = [
        optax.clip_by_global_norm(tc.grad_clip),
        adam,
        optax.add_decayed_weights(
            tc.weight_decay,
            mask=lambda p: jax.tree_util.tree_map(lambda x: x.ndim >= 2, p),
        ),
        optax.scale_by_learning_rate(cosine_lr(tc)),
    ]
    opt = optax.chain(*chain)
    if trainable_mask is not None:
        # masked() leaves un-masked gradients untouched (identity), which would
        # still update frozen params — explicitly zero them instead.
        frozen = jax.tree_util.tree_map(lambda b: not b, trainable_mask)
        opt = optax.chain(
            optax.masked(opt, trainable_mask),
            optax.masked(optax.set_to_zero(), frozen),
        )
    return opt


def cross_entropy_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, ignore_index: int = IGNORE_INDEX
) -> jnp.ndarray:
    """Token-mean cross entropy skipping ``ignore_index`` labels
    (reference: finetune/full.py:193-198 uses ignore_index=-1)."""
    valid = targets != ignore_index
    safe = jnp.where(valid, targets, 0)
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    ll = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, logz - ll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1).astype(jnp.float32)


def shift_labels(input_ids: jnp.ndarray, targets: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Next-token alignment: logits[..., :-1] vs targets[..., 1:]
    (reference: finetune/full.py:193-198)."""
    return input_ids[..., :-1], targets[..., 1:]


def loss_fn(
    params: Params,
    input_ids: jnp.ndarray,
    targets: jnp.ndarray,
    config: LLaMAConfig,
    remat: bool = True,
    remat_policy: str = "dots",
) -> jnp.ndarray:
    logits, _ = llama.forward(
        params, input_ids, config, remat=remat, remat_policy=remat_policy
    )
    return cross_entropy_loss(logits, targets)


def init_train_state(
    params: Params, optimizer: optax.GradientTransformation
) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.int32(0))


@functools.partial(
    jax.jit, static_argnames=("config", "optimizer", "remat", "remat_policy")
)
def train_step(
    state: TrainState,
    input_ids: jnp.ndarray,  # (A, B, T) A = accumulation microsteps
    targets: jnp.ndarray,  # (A, B, T)
    config: LLaMAConfig,
    optimizer: optax.GradientTransformation,
    remat: bool = True,
    remat_policy: str = "dots",
) -> Tuple[TrainState, jnp.ndarray]:
    """One optimizer step over ``A`` microbatches.

    The reference runs A-1 forward/backwards under ``no_backward_sync`` then syncs
    on the A-th (pretrain/redpajama.py:159-166). Here the microbatch loop is a
    ``lax.scan`` accumulating gradients; the optimizer applies once.
    """
    grad_of = jax.value_and_grad(loss_fn)

    def micro(carry, mb):
        loss_sum, grad_sum = carry
        ids, tgt = mb
        loss, grads = grad_of(state.params, ids, tgt, config, remat, remat_policy)
        return (
            (loss_sum + loss, jax.tree_util.tree_map(jnp.add, grad_sum, grads)),
            None,
        )

    A = input_ids.shape[0]
    # NOTE: seeding the accumulator with microbatch 0's grads (instead of a
    # zero tree) was tried and reverted — it inlines a SECOND copy of the
    # remat'd forward+backward next to the scan body, roughly doubling the
    # train-step compile for a ~0.5% step-time saving at the 0.44B config.
    zero_grads = jax.tree_util.tree_map(
        lambda p: jnp.zeros(p.shape, jnp.float32), state.params
    )
    (loss_sum, grads), _ = jax.lax.scan(
        micro, (jnp.float32(0.0), zero_grads), (input_ids, targets)
    )
    grads = jax.tree_util.tree_map(lambda g: g / A, grads)
    updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    # keep param dtype stable (optax promotes to fp32 when updates are fp32)
    new_params = jax.tree_util.tree_map(
        lambda new, old: new.astype(old.dtype), new_params, state.params
    )
    return TrainState(new_params, new_opt, state.step + 1), loss_sum / A
