"""TPU-native LLaMA: pure-functional forward over a parameter pytree.

Capability parity with the reference's single-file model (lit_llama/model.py:51-254):
token embedding, N pre-norm blocks (fused-QKV causal self-attention with RoPE and a
static-shape KV cache with roll-left overflow, SwiGLU MLP), final RMSNorm, untied
lm_head, vocab padded to a multiple of 64.

TPU-first design decisions (vs the reference's mutable nn.Module):

* Parameters are a nested dict pytree with **layers stacked on a leading axis** and
  the block applied via ``lax.scan`` — one trace/compile of the block regardless of
  depth, uniform sharding annotations across layers, and `jax.remat` applies to the
  scanned body for activation checkpointing (replaces FSDP's per-Block
  activation_checkpointing wrapper, reference: pretrain/redpajama.py:70-75).
* The KV cache is explicit state threaded through the call — arrays of shape
  (L, B, H, S, hs) updated with `lax.dynamic_update_slice`; the reference's
  roll-left-on-overflow (model.py:211-221) becomes a `lax.cond` so the whole decode
  step stays one compiled XLA program (no per-token `xm.mark_step` graph cuts,
  generate.py:57-60).
* Quantization / LoRA / Adapter are parameter-structure variants resolved at build
  time (see ops/linear.py), not runtime class swaps.

Positions passed via ``input_pos`` must be contiguous (`arange(start, start+T)`), as
produced by prefill/decode — this is the only pattern the reference's generate loop
produces and it lets the cache update be a dynamic_update_slice instead of a scatter.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from lit_llama_tpu.models.config import LLaMAConfig
from lit_llama_tpu.ops.attention import attention
from lit_llama_tpu.ops.linear import linear, quantize_int4, quantize_int8
from lit_llama_tpu.ops.norm import rms_norm
from lit_llama_tpu.ops.rope import apply_rope, build_rope_cache

Params = Dict[str, Any]
KVCache = Dict[str, jnp.ndarray]  # {"k": (L,B,H,S,hs), "v": (L,B,H,S,hs)}


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def init_params(config: LLaMAConfig, key: jax.Array) -> Params:
    """Random init: normal(0, 0.02/sqrt(2*n_layer)) for linears and the embedding
    (reference: lit_llama/model.py:70-74)."""
    std = 0.02 / math.sqrt(2 * config.n_layer)
    dtype = jnp.dtype(config.param_dtype)
    D, V, I, L = (
        config.n_embd,
        config.padded_vocab_size,
        config.intermediate_size,
        config.n_layer,
    )
    keys = jax.random.split(key, 8)

    def normal(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    params = {
        "wte": normal(keys[0], (V, D)),
        "h": {
            "rms_1": jnp.ones((L, D), dtype),
            "attn": {
                "c_attn": {"w": normal(keys[1], (L, D, 3 * D))},
                "c_proj": {"w": normal(keys[2], (L, D, D))},
            },
            "rms_2": jnp.ones((L, D), dtype),
            "mlp": {
                "c_fc1": {"w": normal(keys[3], (L, D, I))},
                "c_fc2": {"w": normal(keys[4], (L, D, I))},
                "c_proj": {"w": normal(keys[5], (L, I, D))},
            },
        },
        "ln_f": jnp.ones((D,), dtype),
        "lm_head": {"w": normal(keys[6], (D, V))},
    }
    if config.lora is not None:
        from lit_llama_tpu.peft import lora as lora_mod

        params = lora_mod.add_lora_params(params, config, keys[7])
    if config.adapter is not None:
        from lit_llama_tpu.peft import adapter as adapter_mod

        params = adapter_mod.add_adapter_params(params, config)
    return params


def init_kv_cache(
    config: LLaMAConfig, batch_size: int, max_seq_length: int, dtype=None,
    packed: bool = False,
) -> KVCache:
    """Zero-initialized static-shape cache (reference: lit_llama/model.py:108-114).

    With ``config.kv_cache_dtype == "int8"`` k/v are stored int8 with an f32
    scale per (layer, batch, head, position) — half the memory and read
    bandwidth of a bf16 cache.

    ``packed=True``: the bf16-pair uint32 layout (L, B, H, S//2, hs) consumed
    by the fused decode kernels (ops/fused_layer.pack_kv) — bf16 density with
    only 32-bit DMAs. Requires an even ``max_seq_length`` and no int8 cache."""
    dtype = dtype or jnp.dtype(config.compute_dtype)
    if packed:
        assert config.kv_cache_dtype is None and max_seq_length % 2 == 0
        shape = (
            config.n_layer,
            batch_size,
            config.n_head,
            max_seq_length // 2,
            config.head_size,
        )
        cache = {"k": jnp.zeros(shape, jnp.uint32),
                 "v": jnp.zeros(shape, jnp.uint32)}
        if config.adapter is not None:
            from lit_llama_tpu.peft import adapter as adapter_mod

            cache.update(adapter_mod.init_adapter_cache(config, batch_size, dtype))
        return cache
    shape = (
        config.n_layer,
        batch_size,
        config.n_head,
        max_seq_length,
        config.head_size,
    )
    if config.kv_cache_dtype == "int8":
        sshape = shape[:-1] + (1,)
        cache = {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "ks": jnp.zeros(sshape, jnp.float32),
            "vs": jnp.zeros(sshape, jnp.float32),
        }
    else:
        cache = {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    if config.adapter is not None:
        from lit_llama_tpu.peft import adapter as adapter_mod

        cache.update(adapter_mod.init_adapter_cache(config, batch_size, dtype))
    return cache


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _quantize_kv(x: jnp.ndarray):
    """Symmetric per-(batch, head, position) int8 quantization of k/v vectors."""
    x32 = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _cache_write(arr: jnp.ndarray, new: jnp.ndarray, write_pos: jnp.ndarray) -> jnp.ndarray:
    """Write ``new`` (B, H, T, d) into ``arr`` (B, H, S, d) at write_pos —
    scalar (contiguous slice, reference model.py:211-221) or per-slot vector
    (continuous batching). The per-slot path is ONE scatter per array: the
    vmapped dynamic_update_slice it replaces was lowered by XLA as a while
    loop over the batch (traced: ~64 inner whiles at ~126 us each = ~8 ms per
    decode step at 32 slots — the dominant batch-scaling cost).

    When ``arr`` is the packed bf16-pair uint32 layout (B, H, S//2, hs), rows
    of ``new`` merge into their positions' word halves (prefill writes assume
    an even scalar write_pos — chunk starts always are)."""
    if arr.dtype == jnp.uint32 and new.dtype != jnp.uint32:
        return _cache_write_packed(arr, new, write_pos)
    if write_pos.ndim == 0:
        return jax.lax.dynamic_update_slice(arr, new, (0, 0, write_pos, 0))
    B = arr.shape[0]
    return arr.at[jnp.arange(B), :, write_pos].set(
        new[:, :, 0], unique_indices=True, indices_are_sorted=True
    )


def _bf16_word_bits(x: jnp.ndarray) -> jnp.ndarray:
    """bf16-rounded bit pattern of ``x`` in the low 16 bits of a u32."""
    f32 = x.astype(jnp.bfloat16).astype(jnp.float32)
    return jax.lax.bitcast_convert_type(f32, jnp.uint32) >> 16


def _cache_write_packed(
    arr: jnp.ndarray, new: jnp.ndarray, write_pos: jnp.ndarray
) -> jnp.ndarray:
    """XLA-side write into the packed uint32 pair cache (see
    ops/fused_layer.pack_kv). Decode normally writes inside the Pallas kernels
    (RMW of the word-row); this path serves prefill (scalar, even write_pos,
    odd tails padded — the garbage half-word is position T, overwritten before
    it becomes visible) and the kernel-off fallback (per-slot vector RMW)."""
    from lit_llama_tpu.ops.fused_layer import pack_kv

    B, H, T, hs = new.shape
    if write_pos.ndim == 0:
        if T == 1:
            wr = write_pos // 2
            hi = (write_pos % 2) == 1
            old = jax.lax.dynamic_slice(
                arr, (0, 0, wr, 0), (B, H, 1, hs)
            )
            bits = _bf16_word_bits(new)
            merged = jnp.where(
                hi,
                (old & jnp.uint32(0xFFFF)) | (bits << 16),
                (old & jnp.uint32(0xFFFF0000)) | bits,
            )
            return jax.lax.dynamic_update_slice(arr, merged, (0, 0, wr, 0))
        if T % 2:
            new = jnp.pad(new, ((0, 0), (0, 0), (0, 1), (0, 0)))
        words = pack_kv(new)
        return jax.lax.dynamic_update_slice(arr, words, (0, 0, write_pos // 2, 0))
    # per-slot vector (B,): RMW merge of each slot's word-row
    wr = write_pos // 2
    old = arr[jnp.arange(B), :, wr]  # (B, H, hs) u32
    bits = _bf16_word_bits(new[:, :, 0])
    merged = jnp.where(
        ((write_pos % 2) == 1)[:, None, None],
        (old & jnp.uint32(0xFFFF)) | (bits << 16),
        (old & jnp.uint32(0xFFFF0000)) | bits,
    )
    return arr.at[jnp.arange(B), :, wr].set(
        merged, unique_indices=True, indices_are_sorted=True
    )


def _block(
    layer_params: Params,
    x: jnp.ndarray,
    rope: jnp.ndarray,
    mask: jnp.ndarray,
    config: LLaMAConfig,
    kv: Optional[KVCache],
    write_pos: Optional[jnp.ndarray],
    causal: bool,
    tp_axis: Optional[str] = None,
    attend_len: Optional[int] = None,
    limit: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """One pre-norm residual block (reference: lit_llama/model.py:148-168)."""
    h, new_kv = _causal_self_attention(
        layer_params["attn"],
        rms_norm(x, layer_params["rms_1"]),
        rope,
        mask,
        config,
        kv,
        write_pos,
        causal,
        layer_params,
        tp_axis,
        attend_len,
        limit,
    )
    x = x + h
    x = x + _mlp(layer_params["mlp"], rms_norm(x, layer_params["rms_2"]), tp_axis)
    return x, new_kv


def _causal_self_attention(
    attn_params: Params,
    x: jnp.ndarray,
    rope: jnp.ndarray,
    mask: jnp.ndarray,
    config: LLaMAConfig,
    kv: Optional[KVCache],
    write_pos: Optional[jnp.ndarray],
    causal: bool,
    layer_params: Params,
    tp_axis: Optional[str] = None,
    attend_len: Optional[int] = None,
    limit: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Fused-QKV attention (reference: lit_llama/model.py:171-237).

    ``limit``: (B,) int32 — single-token decode visibility bound (key slot s
    visible iff s <= limit[b]); enables the Pallas decode-attention kernel.

    Under ``tp_axis`` (inside shard_map, Megatron-style tensor parallelism) this
    runs on the local head shard: qkv is (B, T, 3*D/mp), the head count derives
    from the tensor width, and the output projection's partial sum is psum'd.
    """
    B, T, C = x.shape
    hs = config.head_size

    qkv = linear(attn_params["c_attn"], x)
    H = qkv.shape[-1] // 3 // hs  # n_head, or the local shard of heads under TP
    if "lora_a" in attn_params["c_attn"]:
        from lit_llama_tpu.peft import lora as lora_mod

        qkv = qkv + lora_mod.lora_delta(attn_params["c_attn"], x, config.lora)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, H, hs)
    k = k.reshape(B, T, H, hs)
    v = v.reshape(B, T, H, hs)

    if config.rope_layout == "half":
        from lit_llama_tpu.ops.rope import apply_rope_half

        q = apply_rope_half(q, rope)
        k = apply_rope_half(k, rope)
    else:
        q = apply_rope(q, rope)
        k = apply_rope(k, rope)

    q = q.transpose(0, 2, 1, 3)  # (B, H, T, hs)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    new_kv = None
    use_da = False
    if kv is not None:
        from lit_llama_tpu.ops import decode_attention as da

        quant_cache = "ks" in kv
        packed_cache = kv["k"].dtype == jnp.uint32
        S_cache = kv["k"].shape[-2] * (2 if packed_cache else 1)
        # Batched (continuous-batching) decode: ONE kernel fuses the per-slot
        # cache-row write with the attention read against the in-place
        # (aliased) cache — the separate scatter forced a cache layout the
        # standalone kernel made XLA copy per layer (VERDICT r2 #2).
        if (
            write_pos is not None
            and write_pos.ndim == 1
            and limit is not None
            and not quant_cache
            and config.adapter is None
            and da.use_write_attention(q, kv["k"], S_cache)
        ):
            # the kernel takes the UNWRAPPED position: visibility limit
            # directly, ring write slot via % S in-kernel
            y, nk, nv = da.decode_attention_write(
                q, k, v, kv["k"], kv["v"], limit
            )
            new_kv = {"k": nk, "v": nv}
            y = y.transpose(0, 2, 1, 3).reshape(B, T, H * hs)
            out = linear(attn_params["c_proj"], y)
            if tp_axis is not None:
                out = jax.lax.psum(out, tp_axis)
            return out, new_kv
        # single-token decode: the Pallas decode-attention kernel streams the
        # cache once (int8 consumed directly — scales fold into the score and
        # the weighted sum) instead of the XLA dequant + einsum chain
        # int8 caches keep the XLA dequant path: the kernel's i8->f32->bf16
        # widening is VPU-bound (109 us/layer) and measured SLOWER end-to-end
        # (64 vs 68.5 tok/s at S=2048) than XLA's fused dequant+einsum.
        use_da = (
            limit is not None
            and attend_len is None
            and not quant_cache
            and not packed_cache
            and da.use_decode_attention(q, kv["k"], S_cache)
        )
        if quant_cache:
            kq, ksc = _quantize_kv(k)
            vq, vsc = _quantize_kv(v)
            new_kv = {
                "k": _cache_write(kv["k"], kq, write_pos),
                "ks": _cache_write(kv["ks"], ksc, write_pos),
                "v": _cache_write(kv["v"], vq, write_pos),
                "vs": _cache_write(kv["vs"], vsc, write_pos),
            }
            if not use_da:
                # fallback: dequantize the full cache for the XLA attention
                k = (new_kv["k"].astype(jnp.float32) * new_kv["ks"]).astype(q.dtype)
                v = (new_kv["v"].astype(jnp.float32) * new_kv["vs"]).astype(q.dtype)
        else:
            # Write the new keys/values at write_pos; attention then runs
            # against the full cache (reference: model.py:211-221).
            new_kv = {
                "k": _cache_write(kv["k"], k, write_pos),
                "v": _cache_write(kv["v"], v, write_pos),
            }
            if packed_cache:
                if attend_len is not None:
                    # prefill-from-zero: the just-computed rows ARE the whole
                    # visible history — keep the local (pre-pack) k/v and skip
                    # the cache round-trip entirely
                    pass
                else:
                    # chunked prefill / kernel-off fallback: unpack the pair
                    # words back to bf16 rows for the XLA attention
                    from lit_llama_tpu.ops.fused_layer import unpack_kv

                    k = unpack_kv(new_kv["k"]).astype(q.dtype)
                    v = unpack_kv(new_kv["v"]).astype(q.dtype)
            else:
                k, v = new_kv["k"], new_kv["v"]

    if use_da:
        from lit_llama_tpu.ops.decode_attention import decode_attention_pallas

        # bf16 caches only: use_da excludes quant_cache — the kernel's int8
        # variant exists and is tested (it folds the scales into the score and
        # weighted sum) but measured VPU-cast-bound, slower end-to-end than
        # XLA's fused dequant+einsum; re-enable via ops/decode_attention.py if
        # the widening cost is ever fixed.
        y = decode_attention_pallas(q, new_kv["k"], new_kv["v"], None, None, limit)
    else:
        if attend_len is not None and kv is not None:
            # prefill-from-zero: only the first attend_len cache slots are live —
            # a static slice keeps the problem (T, T) and flash-eligible
            k = jax.lax.slice_in_dim(k, 0, attend_len, axis=2)
            v = jax.lax.slice_in_dim(v, 0, attend_len, axis=2)
        y = attention(q, k, v, mask, causal=causal)

    if config.adapter is not None:
        from lit_llama_tpu.peft import adapter as adapter_mod

        y, new_kv = adapter_mod.prefix_attention(
            layer_params, q, y, config, new_kv, write_pos
        )

    y = y.transpose(0, 2, 1, 3).reshape(B, T, H * hs)
    out = linear(attn_params["c_proj"], y)
    if tp_axis is not None:
        out = jax.lax.psum(out, tp_axis)
    return out, new_kv


def _slot_rope_tables(rope: jnp.ndarray, config: LLaMAConfig):
    """Per-slot lane tables for the batched fused block-head kernel: expand
    (B, 1, hs/2, 2) gathered rope rows to (B, 3D) cos/sin vectors over the
    fused-QKV lanes — half-basis cos repeated per head over q and k sections,
    identity (cos=1, sin=0) over v."""
    B = rope.shape[0]
    cos = rope[:, 0, :, 0].astype(jnp.float32)  # (B, hs/2)
    sin = rope[:, 0, :, 1].astype(jnp.float32)
    cos_h = jnp.concatenate([cos, cos], axis=-1)  # (B, hs)
    sin_h = jnp.concatenate([-sin, sin], axis=-1)  # signed (see rope_half_row)
    H = config.n_head
    cosD = jnp.tile(cos_h, (1, H))
    sinD = jnp.tile(sin_h, (1, H))
    cos3 = jnp.concatenate([cosD, cosD, jnp.ones_like(cosD)], axis=-1)
    sin3 = jnp.concatenate([sinD, sinD, jnp.zeros_like(sinD)], axis=-1)
    return cos3, sin3


def _block_slot_fused(
    lp: Params,
    x2d: jnp.ndarray,  # (B, D)
    cos3: jnp.ndarray,
    sin3: jnp.ndarray,
    config: LLaMAConfig,
    kv: KVCache,
    limit: jnp.ndarray,  # (B,) slot positions (ring write at % S in-kernel)
) -> Tuple[jnp.ndarray, KVCache]:
    """Batched (serving) decode block as 3 kernel launches: block-head
    (rms_1 + QKV + rope), fused cache-write + attention, block-tail
    (c_proj + residual + rms_2 + SwiGLU + residual). See ops/fused_layer.py."""
    from lit_llama_tpu.ops import decode_attention as da
    from lit_llama_tpu.ops import fused_layer as fl

    B, D = x2d.shape
    H, hs = config.n_head, config.head_size
    cdtype = jnp.dtype(config.compute_dtype).name
    qkv = fl.block_head_fused(
        x2d, lp["rms_1"], cos3, sin3, lp["attn"]["c_attn"],
        B=B, D=D, gs=config.quant_groupsize, cdtype=cdtype,
    )
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q4 = q.reshape(B, H, 1, hs)
    k4 = k.reshape(B, H, 1, hs)
    v4 = v.reshape(B, H, 1, hs)
    y, nk, nv = da.decode_attention_write(q4, k4, v4, kv["k"], kv["v"], limit)
    x2d = fl.block_tail_fused(
        x2d, y.reshape(B, D), lp["rms_2"], lp["attn"]["c_proj"],
        lp["mlp"]["c_fc12"], lp["mlp"]["c_proj"],
        B=B, D=D, I=config.intermediate_size, gs=config.quant_groupsize,
        cdtype=cdtype,
    )
    return x2d, {"k": nk, "v": nv}


def _mlp(
    mlp_params: Params, x: jnp.ndarray, tp_axis: Optional[str] = None
) -> jnp.ndarray:
    """SwiGLU (reference: lit_llama/model.py:240-254). Under ``tp_axis`` the
    hidden dim is sharded and the down-projection's partial sum is psum'd.

    ``c_fc12`` (gate and up projections concatenated along the output axis by
    ``unstack_layers``) computes both in ONE matmul/kernel launch — in
    weight-bound decode each quantized-matmul launch carries a fixed cost, so
    halving the MLP's up-projection launches is a direct win."""
    if "c_fc12" in mlp_params:
        fc1, fc2 = jnp.split(linear(mlp_params["c_fc12"], x), 2, axis=-1)
    else:
        fc1 = linear(mlp_params["c_fc1"], x)
        fc2 = linear(mlp_params["c_fc2"], x)
    out = linear(mlp_params["c_proj"], jax.nn.silu(fc1) * fc2)
    if tp_axis is not None:
        out = jax.lax.psum(out, tp_axis)
    return out


def _remat_policy(name: str):
    """Rematerialization policy for the checkpointed block (VERDICT r1 weak #7).

    "full": save only block inputs, recompute everything (the round-1 blanket
    policy — minimum memory, max recompute). "dots": save matmul outputs with
    no batch dims (jax.checkpoint_policies.dots_with_no_batch_dims_saveable) —
    the backward pass skips recomputing the five projections per block and only
    redoes cheap elementwise work + attention, trading a little activation
    memory for a large cut in recompute FLOPs (the reference relies on FSDP's
    per-Block activation checkpointing, pretrain/redpajama.py:70-75).
    """
    if name == "full":
        return None
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    raise ValueError(f"unknown remat policy {name!r} (use 'dots' or 'full')")


def forward(
    params: Params,
    tokens: jnp.ndarray,
    config: LLaMAConfig,
    *,
    rope_cache: Optional[jnp.ndarray] = None,
    input_pos: Optional[jnp.ndarray] = None,
    slot_pos: Optional[jnp.ndarray] = None,
    kv_cache: Optional[KVCache] = None,
    remat: bool = False,
    remat_policy: str = "dots",
    tp_axis: Optional[str] = None,
    prefill_from_zero: bool = False,
    can_overflow: bool = True,
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Run the model.

    Without ``input_pos``: training/eval forward over (B, T) tokens with a causal
    mask; returns (logits, None).

    With ``input_pos`` (shape (T,), contiguous) and ``kv_cache``: incremental
    decoding — new K/V written into the cache at the given positions, attention over
    the whole cache, rolling the cache left by one when the last position overflows
    (reference: lit_llama/model.py:93-116,211-221). Returns (logits, new_cache).

    With ``slot_pos`` (shape (B,)) and ``kv_cache``: continuous-batching decode —
    each batch slot is an independent sequence writing its single new token at its
    own position (beyond the reference, north-star scope: BASELINE.json config #5).

    With ``tp_axis`` (inside ``shard_map``): Megatron-style tensor parallelism —
    params hold this device's shard of heads / MLP hidden / vocab columns
    (parallel/tp.py lays them out), activations are replicated, one psum after
    each block's two projections, and the vocab-sharded logits are all-gathered
    at the end. wte and the norms must be replicated. LoRA composes: lora_a is
    replicated, lora_b's output dim shards with the q/v head columns
    (parallel/tp.py), and the local delta lands on the local head shard;
    adapter overlays (whose prefix attention spans all heads) are not
    supported under this path.

    ``prefill_from_zero=True`` (static) promises ``input_pos == arange(T)``: the
    attention then reads only the first T cache slots with a causal mask, making
    the Pallas flash kernel eligible for prefill (the einsum fallback would
    materialize (T, S) scores per layer).
    """
    if tp_axis is not None and config.adapter is not None:
        raise NotImplementedError("adapter overlays are not supported under shard_map TP")
    B, T = tokens.shape
    compute_dtype = jnp.dtype(config.compute_dtype)
    if rope_cache is None:
        rope_cache = build_rope_cache(config.block_size, config.head_size)

    x = jnp.take(params["wte"], tokens, axis=0).astype(compute_dtype)

    write_pos = None
    causal = False
    attend_len = None
    kv_seq = isinstance(kv_cache, (list, tuple))
    kv_entry = (kv_cache[0] if kv_seq else kv_cache) if kv_cache is not None else None
    limit = None  # (B,) decode visibility bound for the Pallas decode kernel
    # packed bf16-pair caches store two positions per uint32 word row
    def _cache_positions(entry):
        mult = 2 if entry["k"].dtype == jnp.uint32 else 1
        return entry["k"].shape[-2] * mult

    if slot_pos is not None:
        assert T == 1, "slot_pos decode is single-token per slot"
        S = _cache_positions(kv_entry)
        pos = jnp.clip(slot_pos, 0, config.block_size - 1)
        rope = jnp.take(rope_cache, pos, axis=0)[:, None]  # (B, 1, hs/2, 2)
        key_slots = jnp.arange(S)
        # saturating mask: once slot_pos >= S-1 every cache row is visible
        mask = (key_slots[None, :] <= slot_pos[:, None])[:, None, None, :]
        # Per-slot RING buffer for long generation (reference roll-left:
        # model.py:211-221): past the cache the write wraps and overwrites the
        # slot's oldest row. Attention is permutation-invariant over key
        # slots, so the retained KV set — and thus the output — is identical
        # to the reference's roll, at O(1) per step instead of a full-cache
        # shift (each cached k/v keeps its original RoPE rotation in both
        # schemes; only the storage order differs).
        write_pos = slot_pos % S
        limit = slot_pos
    elif input_pos is None:
        rope = jax.lax.slice_in_dim(rope_cache, 0, T, axis=0)
        mask = jnp.tril(jnp.ones((T, T), bool))[None, None]
        causal = True
    elif prefill_from_zero and T > 1:
        # prefill positions are statically known to be arange(T): attend over
        # the first T cache slots with a plain causal mask (flash-eligible)
        rope = jax.lax.slice_in_dim(rope_cache, 0, T, axis=0)
        mask = jnp.tril(jnp.ones((T, T), bool))[None, None]
        causal = True
        attend_len = T
        write_pos = jnp.int32(0)
    else:
        S = _cache_positions(kv_entry)
        # Overflow: roll the cache one slot left and write at the last slot
        # (reference: model.py:214-218). Only reachable in single-token decode.
        # axis=-2 is the sequence dim in both cache layouts (stacked
        # (L,B,H,S,hs) and per-layer (B,H,S,hs); scales (...,S,1) likewise).
        # ``can_overflow=False`` (static) removes the roll entirely: XLA
        # flattens the cond into slices + select that COPY the whole cache
        # every step (~2.9 ms/step at 7B S=2048, traced), and callers that
        # bound the generation by max_seq_length know statically that the
        # roll can never fire.
        if T == 1 and kv_entry["k"].dtype == jnp.uint32:
            # packed pair cache: ring write (a roll would shift word rows =
            # two positions); retained window identical to the roll's set —
            # attention is permutation-invariant over key slots
            write_pos = input_pos[0] % S
        elif T == 1 and can_overflow:
            overflow = input_pos[-1] >= S
            kv_cache = jax.tree_util.tree_map(
                lambda c: jax.lax.cond(
                    overflow, lambda a: jnp.roll(a, -1, axis=-2), lambda a: a, c
                ),
                kv_cache,
            )
            write_pos = jnp.where(overflow, S - 1, input_pos[0])
        else:
            write_pos = input_pos[0]
        rope_pos = jnp.clip(input_pos, 0, config.block_size - 1)
        rope = jnp.take(rope_cache, rope_pos, axis=0)
        # mask[t, s] = key slot s visible to query at position input_pos[t]; on
        # overflow every slot is visible (mask_cache row beyond S-1 is all ones
        # after the :max_seq_length crop, reference: model.py:95-96).
        key_slots = jnp.arange(S)[None, :]
        mask = (key_slots <= input_pos[:, None])[None, None]
        if T == 1:
            limit = jnp.broadcast_to(input_pos[0], (B,))

    layer_params = params["h"]

    if isinstance(layer_params, (list, tuple)):
        # Unstacked layers (see unstack_layers): Python-unrolled loop with
        # static per-layer weights. This is the inference layout — under scan,
        # XLA materializes a copy of every layer's weights to feed the Pallas
        # custom calls (dynamic-slice of the stacked array), which costs ~as
        # much time as the matmuls themselves in weight-bound decode. Unrolled,
        # each weight is its own buffer and streams HBM->VMEM exactly once.
        if kv_cache is None:
            from lit_llama_tpu.parallel.sharding import constrain_batch

            blk = _block
            if remat:
                blk = jax.checkpoint(
                    _block, static_argnums=(4, 7), policy=_remat_policy(remat_policy)
                )
            x = constrain_batch(x)
            for lp in layer_params:
                x, _ = blk(lp, x, rope, mask, config, None, None, causal, tp_axis)
                x = constrain_batch(x)
            new_cache = None
        elif kv_seq:
            # Per-layer cache tuple matching the unstacked weights: each
            # layer's arrays update in place (donated buffers), with NO
            # per-step slice of a stacked cache and NO re-stack — the stacked
            # layout cost two full cache copies per decode step (~134 MB at
            # 7B/S=128, growing linearly with S).
            serve_fused = False
            if (
                slot_pos is not None
                and tp_axis is None
                and config.adapter is None
                and "ks" not in kv_entry
            ):
                from lit_llama_tpu.ops import decode_attention as da
                from lit_llama_tpu.ops import fused_layer as fl

                packed_c = kv_entry["k"].dtype == jnp.uint32
                S_c = kv_entry["k"].shape[-2] * (2 if packed_c else 1)
                # kernel-compatible layouts only: packed bf16 pairs or f32
                # direct (raw bf16 caches can't be DMA'd at dynamic offsets
                # on this toolchain — ops/fused_layer.py module docstring)
                cache_ok = (
                    (packed_c and compute_dtype == jnp.bfloat16
                     and S_c % 16 == 0 and (S_c <= 512 or S_c % 256 == 0))
                    or (kv_entry["k"].dtype == compute_dtype == jnp.float32
                        and (S_c <= 512 or S_c % 128 == 0))
                )
                # a PACKED (uint32) cache can only be consumed by the fused
                # kernels — the engine chose the layout at init, so the
                # layout decides the path here (re-reading the env between
                # init and trace could otherwise disagree with it)
                serve_fused = cache_ok and (
                    packed_c
                    or fl.use_serve_fused(config, layer_params[0], batch=x.shape[0])
                )
            if serve_fused:
                # batched fused decode: 3 launches per block, no XLA glue
                cos3, sin3 = _slot_rope_tables(rope, config)
                x2d = x[:, 0, :]
                new_layers = []
                for lp, kv_l in zip(layer_params, kv_cache):
                    x2d, new_kv_l = _block_slot_fused(
                        lp, x2d, cos3, sin3, config, kv_l, limit
                    )
                    new_layers.append(new_kv_l)
                x = x2d[:, None, :]
                new_cache = tuple(new_layers)
            else:
                new_layers = []
                for lp, kv_l in zip(layer_params, kv_cache):
                    x, new_kv_l = _block(
                        lp, x, rope, mask, config, kv_l, write_pos, causal,
                        tp_axis, attend_len, limit,
                    )
                    new_layers.append(new_kv_l)
                new_cache = tuple(new_layers)
        else:
            acc = None
            for l, lp in enumerate(layer_params):
                kv_l = jax.tree_util.tree_map(lambda c: c[l], kv_cache)
                x, new_kv_l = _block(
                    lp, x, rope, mask, config, kv_l, write_pos, causal, tp_axis,
                    attend_len, limit,
                )
                if acc is None:
                    acc = {name: [] for name in new_kv_l}
                for name in acc:
                    acc[name].append(new_kv_l[name])
            new_cache = {name: jnp.stack(vals) for name, vals in acc.items()}
    elif kv_cache is None:
        from lit_llama_tpu.parallel.sharding import constrain_batch

        def body(h, lp):
            h, _ = _block(lp, h, rope, mask, config, None, None, causal, tp_axis)
            return constrain_batch(h), None

        if remat:
            body = jax.checkpoint(body, policy=_remat_policy(remat_policy))
        x, _ = jax.lax.scan(body, constrain_batch(x), layer_params)
        new_cache = None
    else:

        def body(h, inputs):
            lp, kv = inputs
            h, new_kv = _block(
                lp, h, rope, mask, config, kv, write_pos, causal, tp_axis,
                attend_len, limit,
            )
            return h, new_kv

        x, new_cache = jax.lax.scan(body, x, (layer_params, kv_cache))

    x = rms_norm(x, params["ln_f"])
    logits = linear(params["lm_head"], x)
    if tp_axis is not None:
        # vocab-sharded lm_head -> gather the full logits row
        logits = jax.lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
    return logits, new_cache


def unstack_layers(params: Params, fuse_mlp: bool = True) -> Params:
    """Convert the stacked (L, ...) layer pytree into a tuple of per-layer trees.

    Inference layout: ``forward`` unrolls the layer loop over it so each layer's
    weights feed the Pallas kernels as their own buffers (no per-step
    dynamic-slice copies — see the comment in ``forward``). Training keeps the
    stacked layout (one traced block under ``lax.scan`` + uniform shardings).

    ``fuse_mlp`` additionally concatenates each layer's c_fc1/c_fc2 (same
    input, same shape) along the output axis into ``c_fc12`` — one matmul
    launch instead of two per MLP (see ``_mlp``). Works for dense, int8 and
    int4 leaves and the adapter-v2 bias/scale (all are (..., out)-trailing).
    The TP layout keeps them separate (parallel/tp.py shards each).

    The one-time eager slicing here costs one pass over the weights at load.
    """
    if isinstance(params.get("h"), (list, tuple)):
        return params
    h = params["h"]
    L = jax.tree_util.tree_leaves(h)[0].shape[0]
    out = dict(params)
    layers = []
    for l in range(L):
        lp = jax.tree_util.tree_map(lambda a: a[l], h)
        if fuse_mlp:
            mlp = lp["mlp"]
            f1, f2 = mlp["c_fc1"], mlp["c_fc2"]
            if set(f1) == set(f2):
                lp["mlp"] = {
                    "c_fc12": {
                        k: jnp.concatenate([f1[k], f2[k]], axis=-1) for k in f1
                    },
                    "c_proj": mlp["c_proj"],
                }
        layers.append(lp)
    out["h"] = tuple(layers)
    return out


def unstack_kv_cache(cache: KVCache) -> KVCache:
    """Convert a stacked (L, ...) KV cache into a tuple of per-layer caches —
    the layout ``forward`` uses with unstacked (inference) weights. Stacked
    caches still work but cost two full-cache copies per decode step (slice
    per layer + re-stack)."""
    if cache is None or isinstance(cache, (list, tuple)):
        return cache
    if not cache:
        return cache
    L = next(iter(cache.values())).shape[0]
    return tuple(
        jax.tree_util.tree_map(lambda c: c[l], cache) for l in range(L)
    )


def stack_kv_cache(cache: KVCache) -> KVCache:
    """Inverse of :func:`unstack_kv_cache`."""
    if cache is None or isinstance(cache, dict):
        return cache
    return {
        name: jnp.stack([layer[name] for layer in cache])
        for name in cache[0]
    }


def unfuse_mlp_layer(lp: Params) -> Params:
    """Split a layer's fused ``c_fc12`` back into c_fc1/c_fc2 (layouts that
    shard the two projections separately, e.g. parallel/tp.py)."""
    mlp = lp.get("mlp", {})
    if "c_fc12" not in mlp:
        return lp
    fused = mlp["c_fc12"]
    halves = {k: jnp.split(v, 2, axis=-1) for k, v in fused.items()}
    new_lp = dict(lp)
    new_lp["mlp"] = {
        "c_fc1": {k: v[0] for k, v in halves.items()},
        "c_fc2": {k: v[1] for k, v in halves.items()},
        "c_proj": mlp["c_proj"],
    }
    return new_lp


def stack_layers(params: Params) -> Params:
    """Inverse of :func:`unstack_layers` (for saving inference-tuned params)."""
    h = params.get("h")
    if not isinstance(h, (list, tuple)):
        return params
    h = [unfuse_mlp_layer(lp) for lp in h]
    out = dict(params)
    out["h"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *h)
    return out


# ---------------------------------------------------------------------------
# Quantization of a parameter pytree (weight-only)
# ---------------------------------------------------------------------------

_QUANT_TARGETS = ("c_attn", "c_proj", "c_fc1", "c_fc2", "lm_head")


def quantize_params(params: Params, config: LLaMAConfig) -> Params:
    """Convert dense linear weights to the quantized representation.

    Quantizes the same five per-block linears plus lm_head as the reference's GPTQ
    driver (quantize/gptq.py:66-72,131-150); the embedding and norms stay dense.
    For round-to-nearest quantization only — GPTQ produces these params via
    lit_llama_tpu.quant.gptq instead.
    """
    if config.quantize is None:
        return params

    def quant_one(w):
        # w may be stacked (L, in, out) or flat (in, out).
        if w.ndim == 3:
            fn = jax.vmap(_quantizer(config), in_axes=0)
        else:
            fn = _quantizer(config)
        return fn(w)

    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy

    def visit(d):
        for name, sub in d.items():
            if isinstance(sub, dict):
                if name in _QUANT_TARGETS and "w" in sub:
                    q = quant_one(sub.pop("w"))
                    sub.update(q)
                else:
                    visit(sub)

    visit(out)
    return out


def _quantizer(config: LLaMAConfig):
    if config.quantize == "int8":
        return quantize_int8
    if config.quantize == "int4":
        import functools

        return functools.partial(quantize_int4, groupsize=config.quant_groupsize)
    raise ValueError(f"unknown quantize mode {config.quantize!r}")
