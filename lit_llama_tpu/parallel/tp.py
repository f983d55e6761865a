"""Explicit tensor-parallel inference via shard_map.

Under plain jit-SPMD, XLA cannot partition the Pallas dequant-matmul custom
calls, so model-sharded quantized weights would be all-gathered (losing the
entire point of TP). This module runs the forward inside ``shard_map`` instead:
every device holds its shard of heads / MLP hidden / vocab columns, the kernels
see LOCAL shapes, and the only communication is one psum after each block's two
projections plus one logits all-gather — the textbook Megatron schedule, riding
ICI.

Layout (per device, mp = model-parallel degree):
  wte, norms          replicated
  c_attn              (D, 3·D/mp)   qkv column shard = H/mp heads
  attn c_proj         (D/mp, D)     row shard -> psum
  c_fc1 / c_fc2       (D, I/mp)
  mlp c_proj          (I/mp, D)     row shard -> psum
  lm_head             (D, V/mp)     logits all-gathered
  kv cache            (L, B, H/mp, S, hs)

Quantized leaves shard with their weight: qw like w, int4 qscale/qzero like the
output dim; int8 qscale like the output dim. The int4 contraction-dim packing
(half-split planes) is untouched because TP shards the OTHER dim of every
quantized matmul.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from lit_llama_tpu.models import llama
from lit_llama_tpu.models.config import LLaMAConfig
from lit_llama_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

Params = Dict[str, Any]


def tp_param_specs(params: Params) -> Params:
    """PartitionSpec tree for the shard_map TP layout (works for stacked and
    unstacked layer pytrees)."""

    def spec(path, leaf) -> P:
        keys = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
        name = keys[-1]
        parent = keys[-2] if len(keys) >= 2 else ""
        pad = leaf.ndim - 2  # leading L axis when stacked

        def p(*dims):
            return P(*([None] * pad + list(dims)))

        if name == "wte":
            return P(None, None)
        if name == "lora_a":
            return P(*([None] * leaf.ndim))  # replicated (small, x is replicated)
        if name == "lora_b":
            # (…, g, r, D): output columns shard with the q/v head columns —
            # heads are contiguous in D, so a D/mp chunk IS the head shard
            return p(None, MODEL_AXIS)
        if parent == "lm_head":
            return P(None, MODEL_AXIS)
        if parent in ("c_attn", "c_fc1", "c_fc2"):
            if name in ("qscale", "qzero"):
                return p(None, MODEL_AXIS)
            return p(None, MODEL_AXIS)  # split output dim
        if parent == "c_proj":
            if name in ("qscale", "qzero"):
                return p(MODEL_AXIS, None)  # groups follow the contraction dim
            return p(MODEL_AXIS, None)  # split input (contraction) dim
        return P(*([None] * leaf.ndim))  # norms etc. replicated

    return jax.tree_util.tree_map_with_path(spec, params)


def _qkv_col_perm(d3: int, mp: int) -> jnp.ndarray:
    """Permutation making contiguous 1/mp chunks of the fused QKV columns equal
    (q-shard, k-shard, v-shard) per device — plain contiguous sharding of
    [q | k | v] would give device 0 all of q instead of its heads."""
    d = d3 // 3
    sh = d // mp
    idx = []
    for dev in range(mp):
        for t in range(3):
            start = t * d + dev * sh
            idx.extend(range(start, start + sh))
    return jnp.asarray(idx)


def _repack_rows(leaf: Params, mp: int) -> Params:
    """Re-pack a row-sharded int4 weight so each device's shard is half-split
    over its LOCAL rows (global half-split pairs rows K/2 apart, which a row
    shard would tear)."""
    from lit_llama_tpu.ops.linear import pack_int4, unpack_int4

    q = unpack_int4(leaf["qw"])  # (K, N)
    shards = jnp.split(q, mp, axis=0)
    out = dict(leaf)
    out["qw"] = jnp.concatenate([pack_int4(s) for s in shards], axis=0)
    return out


def _pad_quant_rows(leaf: Params, k_pad: int, gs: int) -> Params:
    """Pad a quantized (K, N) weight's contraction dim with zero-valued groups
    (scale = zero = 0 dequantizes to exactly 0)."""
    from lit_llama_tpu.ops.linear import pack_int4, unpack_int4

    q = unpack_int4(leaf["qw"])
    K, N = q.shape
    out = dict(leaf)
    out["qw"] = None  # rebuilt by caller after repack
    q = jnp.pad(q, ((0, k_pad - K), (0, 0)))
    pad_groups = (k_pad - K) // gs
    out["_q_unpacked"] = q
    out["qscale"] = jnp.pad(leaf["qscale"], ((0, pad_groups), (0, 0)))
    out["qzero"] = jnp.pad(leaf["qzero"], ((0, pad_groups), (0, 0)))
    return out


def prepare_tp_params(params: Params, config: LLaMAConfig, mp: int) -> Params:
    """Host-side layout transforms required before sharding over ``model``:

    * c_attn columns permuted so contiguous shards hold (q, k, v) head groups;
    * row-sharded int4 weights (attn/mlp c_proj) re-packed per local shard,
      with the MLP hidden dim zero-padded up to a multiple of mp·2·groupsize
      when needed (padded channels produce exact zeros end to end).
    """
    from lit_llama_tpu.ops.linear import pack_int4, unpack_int4
    from lit_llama_tpu.utils.math import find_multiple

    params = llama.unstack_layers(params, fuse_mlp=False)
    gs = config.quant_groupsize

    def fix_layer(lp: Params) -> Params:
        lp = llama.unfuse_mlp_layer(lp)  # TP shards c_fc1/c_fc2 separately
        lp = jax.tree_util.tree_map(lambda a: a, lp)  # copy dicts
        attn, mlp = lp["attn"], lp["mlp"]
        # 1. QKV column permutation (applies to dense and quantized alike)
        ca = dict(attn["c_attn"])
        d3 = (ca["w"] if "w" in ca else ca["qw"]).shape[-1]
        perm = _qkv_col_perm(d3, mp)
        for k in ("w", "qw", "qscale", "qzero"):
            if k in ca:
                ca[k] = ca[k][..., perm]
        attn = dict(attn)
        attn["c_attn"] = ca

        def fix_proj(proj: Params, quantized_pad_to: int = 0) -> Params:
            if "qw" not in proj:
                return proj
            out = dict(proj)
            K = proj["qw"].shape[0] * 2
            k_pad = quantized_pad_to or K
            if k_pad != K:
                out = _pad_quant_rows(proj, k_pad, gs)
                q = out.pop("_q_unpacked")
                shards = jnp.split(q, mp, axis=0)
                out["qw"] = jnp.concatenate([pack_int4(s) for s in shards], axis=0)
                return out
            return _repack_rows(proj, mp)

        attn["c_proj"] = fix_proj(dict(attn["c_proj"]))
        mlp = dict(mlp)
        I = (
            mlp["c_proj"]["qw"].shape[0] * 2
            if "qw" in mlp["c_proj"]
            else mlp["c_proj"]["w"].shape[0]
        )
        I_pad = find_multiple(I, mp * 2 * gs) if "qw" in mlp["c_proj"] else find_multiple(I, mp)
        if I_pad != I:
            # pad the fc output dims to match (padded channels emit zeros)
            for name in ("c_fc1", "c_fc2"):
                fc = dict(mlp[name])
                for k in ("w", "qw", "qscale", "qzero"):
                    if k in fc:
                        fc[k] = jnp.pad(fc[k], ((0, 0), (0, I_pad - I)))
                mlp[name] = fc
            if "w" in mlp["c_proj"]:
                proj = dict(mlp["c_proj"])
                proj["w"] = jnp.pad(proj["w"], ((0, I_pad - I), (0, 0)))
                mlp["c_proj"] = proj
            else:
                mlp["c_proj"] = fix_proj(dict(mlp["c_proj"]), quantized_pad_to=I_pad)
        else:
            mlp["c_proj"] = fix_proj(dict(mlp["c_proj"]))
        lp["attn"] = attn
        lp["mlp"] = mlp
        return lp

    out = dict(params)
    out["h"] = tuple(fix_layer(lp) for lp in params["h"])
    return out


def shard_params_tp(
    params: Params, mesh: Mesh, config: Optional[LLaMAConfig] = None
) -> Params:
    """Prepare (permute/repack/pad) and place params for shard_map TP."""
    mp = mesh.shape[MODEL_AXIS]
    if config is not None and mp > 1:
        params = prepare_tp_params(params, config, mp)
    specs = tp_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def cache_spec(data: bool = False) -> P:
    """Stacked-cache (L, B, H, S, hs) spec: heads over ``model``; with
    ``data=True`` the batch (slot) axis is additionally sharded over ``data`` —
    each data-group of devices holds its own slots' cache rows (DP serving,
    VERDICT r2 next #6)."""
    return P(None, DATA_AXIS if data else None, MODEL_AXIS, None, None)


def cache_specs(config: LLaMAConfig, data: bool = False):
    keys = ["k", "v"] + (["ks", "vs"] if config.kv_cache_dtype == "int8" else [])
    return {k: cache_spec(data) for k in keys}


def make_sharded_forwards(config: LLaMAConfig, mesh: Mesh, params_template: Params):
    """Unjitted shard_map-wrapped forward callables for embedding in larger
    jitted programs (e.g. the serving engine's chunked decode scan):

    fwd_prefill(params, tokens (B,T), input_pos (T,), cache) -> (logits, cache)
    fwd_decode(params, tokens (B,1), slot_pos (B,), cache) -> (logits, cache)

    When the mesh's ``data`` axis is > 1 the DECODE path shards the batch/slot
    axis over it (tokens, slot_pos, cache batch dim, logits) — the forward is
    batch-parallel, so each data-group decodes only its local slots with zero
    cross-data communication. Prefill stays data-replicated: it runs on a
    single sliced slot (batch 1), which cannot split over the data axis; the
    jit around it reshards that one slot's rows in and out.
    """
    dp = mesh.shape.get(DATA_AXIS, 1) > 1
    pspecs = tp_param_specs(params_template)
    rep = P()

    def _prefill(params, tokens, input_pos, cache):
        return llama.forward(
            params, tokens, config, input_pos=input_pos, kv_cache=cache,
            tp_axis=MODEL_AXIS, prefill_from_zero=True,
        )

    def _decode(params, tokens, slot_pos, cache):
        return llama.forward(
            params, tokens, config, slot_pos=slot_pos, kv_cache=cache,
            tp_axis=MODEL_AXIS,
        )

    prefill = shard_map(
        _prefill, mesh=mesh,
        in_specs=(pspecs, rep, rep, cache_specs(config)),
        out_specs=(rep, cache_specs(config)),
        check_vma=False,
    )
    batched = P(DATA_AXIS) if dp else rep
    decode = shard_map(
        _decode, mesh=mesh,
        in_specs=(pspecs, batched, batched, cache_specs(config, data=dp)),
        out_specs=(batched, cache_specs(config, data=dp)),
        check_vma=False,
    )
    return prefill, decode


def make_tp_forward(config: LLaMAConfig, mesh: Mesh, params_template: Params):
    """Jitted (prefill_fn, decode_fn) versions of :func:`make_sharded_forwards`."""
    fwd_prefill, fwd_decode = make_sharded_forwards(config, mesh, params_template)
    return jax.jit(fwd_prefill), jax.jit(fwd_decode)


def generate_tp(
    params: Params,
    prompt,
    max_new_tokens: int,
    *,
    config: LLaMAConfig,
    mesh: Mesh,
    max_seq_length: Optional[int] = None,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    eos_id: Optional[int] = None,
    key: Optional[jax.Array] = None,
):
    """Single-prompt generation through the shard_map TP forward (the
    tensor-parallel sibling of models/generate.generate — same sampling, eos
    early-exit, and single-compile whole-loop structure; the decode body is the
    slot_pos ring-buffer step, so long generations wrap like the reference's
    roll-left). ``params`` must already be laid out by :func:`shard_params_tp`.
    Composes with LoRA overlays (lora_b shards with the head columns)."""
    import numpy as np

    from lit_llama_tpu.models.generate import sample_logits
    from lit_llama_tpu.ops.rope import build_rope_cache  # noqa: F401 (parity)

    prompt = jnp.asarray(prompt, jnp.int32)
    T = int(prompt.shape[0])
    T_new = T + int(max_new_tokens)
    S = min(max_seq_length or T_new, config.block_size)
    if key is None:
        key = jax.random.PRNGKey(0)
    fwd_prefill, fwd_decode = make_sharded_forwards(config, mesh, params)
    cache = init_tp_cache(config, mesh, 1, S)

    @functools.partial(jax.jit, static_argnums=())
    def run(params, prompt, cache, key):
        buf = jnp.zeros((T_new,), jnp.int32)
        buf = jax.lax.dynamic_update_slice(buf, prompt, (0,))
        logits, cache = fwd_prefill(params, prompt[None, :], jnp.arange(T), cache)
        key, sub = jax.random.split(key)
        nxt = sample_logits(
            logits[0, -1].astype(jnp.float32), sub, temperature, top_k
        )
        buf = buf.at[T].set(nxt)

        def cond(state):
            i, _, _, _, done = state
            return jnp.logical_and(
                i < max_new_tokens - 1, jnp.logical_not(done)
            )

        def body(state):
            i, buf, cache, key, done = state
            pos = T + i
            tok = jax.lax.dynamic_slice(buf, (pos,), (1,))
            logits, cache = fwd_decode(params, tok[None, :], pos[None], cache)
            key, sub = jax.random.split(key)
            nxt = sample_logits(
                logits[0, -1].astype(jnp.float32), sub, temperature, top_k
            )
            buf = jax.lax.dynamic_update_slice(buf, nxt[None], (pos + 1,))
            done = (nxt == eos_id) if eos_id is not None else jnp.bool_(False)
            return i + 1, buf, cache, key, done

        init_done = (nxt == eos_id) if eos_id is not None else jnp.bool_(False)
        if max_new_tokens > 1:
            i, buf, cache, key, done = jax.lax.while_loop(
                cond, body, (jnp.int32(0), buf, cache, key, init_done)
            )
        else:
            i = jnp.int32(0)
        return buf, i + 1

    buf, n_generated = run(params, prompt, cache, key)
    n = int(n_generated)
    return np.asarray(buf)[: T + n]


def init_tp_cache(
    config: LLaMAConfig, mesh: Mesh, batch_size: int, max_seq_length: int, dtype=None
):
    """Slots shard over ``data`` (when the axis is >1 and divides the batch),
    heads over ``model``."""
    dp = mesh.shape.get(DATA_AXIS, 1)
    data = dp > 1 and batch_size % dp == 0
    cache = llama.init_kv_cache(config, batch_size, max_seq_length, dtype)
    return jax.tree_util.tree_map(
        lambda c: jax.device_put(c, NamedSharding(mesh, cache_spec(data))), cache
    )
