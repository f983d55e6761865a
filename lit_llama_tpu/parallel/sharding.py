"""Partition specs for the LLaMA parameter pytree, KV cache, and batches.

Replaces the reference's strategy wrappers (FSDPStrategy auto-wrap,
pretrain/redpajama.py:70-75; DeepSpeed ZeRO-2, finetune/adapter.py:60-64) with
data: sharding annotations on the pytree. XLA SPMD then emits exactly the
all-gather / reduce-scatter schedule FSDP hand-implements.

Layout rules (params stored (in, out); layers stacked on leading L axis):

  tensor parallel (``model`` axis) — Megatron-style pairing so each block needs
  exactly two collectives (one psum after attention, one after the MLP):
    c_attn   (L, D, 3D): split output  → heads sharded
    c_proj   (L, D, D):  split input   → psum at block output
    c_fc1/2  (L, D, I):  split output  → hidden sharded
    mlp proj (L, I, D):  split input   → psum
    lm_head  (D, V):     split output  → logits sharded over vocab
    wte      (V, D):     split vocab rows (gathered at lookup)

  fsdp (``data`` axis) — the remaining big dimension of each weight is sharded
  over data; XLA all-gathers just-in-time per layer exactly like
  limit_all_gathers FSDP.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lit_llama_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

Params = Dict[str, Any]


def _leaf_spec(path: Tuple[str, ...], ndim: int, fsdp: bool, tp: bool) -> P:
    model = MODEL_AXIS if tp else None
    data = DATA_AXIS if fsdp else None
    name = path[-1]
    parent = path[-2] if len(path) >= 2 else ""
    stacked = 1 if ndim == 3 else 0  # leading L axis for per-layer stacks

    def pad(spec):
        return P(*([None] * stacked + list(spec)))

    if name == "wte":
        return P(model, data)
    if parent == "lm_head":
        if name in ("qscale", "qzero"):
            return P(None, model)
        if model is None and data is not None:
            # FSDP without TP: shard the OUTPUT (vocab) dim, not the
            # contraction dim — a D-sharded lm_head makes GSPMD all-reduce
            # the full (B, T, V) logits in fwd AND bwd (2x 2.1 GB/step at
            # 13B/T=2048), while a V-shard reduces only the softmax
            # statistics (B, T) and the target gather (census:
            # scripts/comm_anatomy.py --mode train)
            return P(None, data)
        return P(data, model)
    # per-layer stacks -------------------------------------------------------
    if parent in ("c_attn", "c_fc1", "c_fc2"):
        if name in ("qscale", "qzero"):
            return pad([None, model])
        return pad([data, model])  # split output dim
    if parent == "c_proj":
        if name in ("qscale", "qzero"):
            return pad([None, None])
        return pad([model, data])  # split input (contraction) dim
    if name in ("lora_a",):
        return pad([data, None])
    if name in ("lora_b",):
        return pad([None, None])
    if name.startswith("adapter_") or name.startswith("av2_") or name == "gating":
        return P(*([None] * ndim))
    # norms / scalars: replicated
    return P(*([None] * ndim))


def param_pspecs(params: Params, fsdp: bool = False, tp: bool = True) -> Params:
    """PartitionSpec pytree matching ``params``."""

    def f(path, leaf):
        keys = tuple(
            k.key if hasattr(k, "key") else str(k) for k in path
        )
        return _leaf_spec(keys, leaf.ndim, fsdp, tp)

    return jax.tree_util.tree_map_with_path(f, params)


def constrain_batch(x):
    """Pin (B, T, ...) activations to batch-sharding over the ``data`` axis
    when tracing under a mesh whose data axis is real (>1); no-op otherwise.

    GSPMD needs this anchor in the TRAINING forward: with FSDP-sharded weights
    and no activation constraint it is free to move activations instead of
    weights — measured at 13B/T=2048 geometry it chose per-layer (B, T, 3D)
    activation all-gathers (~1 GB each) over the ~150 MB bf16 weight
    all-gathers ZeRO-3 intends (census: scripts/comm_anatomy.py --mode train).
    """
    try:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            from jax.interpreters import pxla

            mesh = pxla.thread_resources.env.physical_mesh
    except Exception:
        return x
    if mesh.empty or DATA_AXIS not in mesh.axis_names or mesh.shape[DATA_AXIS] == 1:
        return x
    spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, spec)


def kv_cache_pspec() -> P:
    """(L, B, H, S, hs): batch over data, heads over model."""
    return P(None, DATA_AXIS, MODEL_AXIS, None, None)


def batch_pspec() -> P:
    """(B, T) token batches: sharded over data like the reference's per-rank
    PackedDataset sharding (packed_dataset.py:50-58)."""
    return P(DATA_AXIS, None)


def shard_params(params: Params, mesh: Mesh, specs: Optional[Params] = None, **kw) -> Params:
    """Place a parameter pytree onto the mesh with the given (or derived) specs."""
    if specs is None:
        specs = param_pspecs(params, **kw)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def named(mesh: Mesh, spec_tree):
    """PartitionSpec pytree -> NamedSharding pytree."""
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )
