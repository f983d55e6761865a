"""Pallas flash attention (causal) for TPU.

Replaces the reference's CUDA flash kernel behind ``F.scaled_dot_product_attention``
(reference: lit_llama/model.py:230) with an online-softmax tiled kernel: O(T) memory,
one pass over K/V blocks, fp32 running max/sum, bf16 MXU matmuls.

Grid: (B, H, Tq blocks, Ts blocks), KV innermost so the (m, l, acc) scratch carries
across KV steps. Causal block-skipping via ``pl.when`` — upper-triangular blocks do
no compute.

Backward: the kernel is wrapped in ``jax.custom_vjp`` whose backward recomputes
attention through the XLA einsum path (mathematically the same function), so
training can differentiate through the flash forward without a handwritten
backward kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
NEG_INF = float(-1e30)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale, block_q, block_k):
    iq = pl.program_id(2)
    jk = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(jk == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # causal: KV block strictly after the Q block contributes nothing
    @pl.when(jk <= iq)
    def _compute():
        q = q_ref[0, 0]  # (block_q, hs)
        k = k_ref[0, 0]  # (block_k, hs)
        v = v_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (block_q, block_k)

        # diagonal-block causal mask (rows attend to cols <= their position);
        # blocks strictly below the diagonal are unmasked
        row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(
            jnp.logical_or(jk < iq, row >= col), s, NEG_INF
        )

        m_prev = m_ref[:]
        l_prev = l_ref[:]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:] = m_new
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(jk == nk - 1)
    def _finalize():
        l = l_ref[:]
        o_ref[0, 0] = (acc_ref[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_forward(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, block_q: int, block_k: int
) -> jnp.ndarray:
    B, H, T, hs = q.shape
    S = k.shape[2]
    scale = 1.0 / (hs**0.5)
    grid = (B, H, pl.cdiv(T, block_q), pl.cdiv(S, block_k))
    kernel = functools.partial(
        _flash_kernel, scale=scale, block_q=block_q, block_k=block_k
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, hs), lambda b, h, i, j: (b, h, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, hs), lambda b, h, i, j: (b, h, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, hs), lambda b, h, i, j: (b, h, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, hs), lambda b, h, i, j: (b, h, i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),  # running max
            pltpu.VMEM((block_q, 1), jnp.float32),  # running sum
            pltpu.VMEM((block_q, hs), jnp.float32),  # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * T * S * hs // 2,  # ~half the blocks run (causal)
            bytes_accessed=(2 * B * H * T * hs + 2 * B * H * S * hs) * q.dtype.itemsize,
            transcendentals=B * H * T * S // 2,
        ),
    )(q, k, v)


def _xla_causal_attention(q, k, v):
    hs = q.shape[-1]
    T, S = q.shape[2], k.shape[2]
    scores = jnp.einsum(
        "bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32
    ) / (hs**0.5)
    mask = jnp.tril(jnp.ones((T, S), bool))
    scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum(
        "bhts,bhsd->bhtd", probs.astype(q.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Causal flash attention. q/k/v: (B, H, T|S, hs) — T == S, hs lane-aligned."""
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            return _flash_forward(q, k, v, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K)
    return _flash_forward(q, k, v, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K)


def _fwd(q, k, v, causal, interpret):
    return flash_attention(q, k, v, causal, interpret), (q, k, v)


def _bwd(causal, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(_xla_causal_attention, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
