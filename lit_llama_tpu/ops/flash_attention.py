"""Pallas flash attention (causal) for TPU.

Replaces the reference's CUDA flash kernel behind ``F.scaled_dot_product_attention``
(reference: lit_llama/model.py:230) with an online-softmax tiled kernel: O(T) memory,
one pass over K/V blocks, fp32 running max/sum, bf16 MXU matmuls.

Grid: (B, H, Tq blocks, Ts blocks), KV innermost so the (m, l, acc) scratch carries
across KV steps. Causal block-skipping via ``pl.when`` — upper-triangular blocks do
no compute.

Backward: flash2-scheme Pallas kernels (one for dQ, one for dK/dV) that
recompute the probability tiles from the saved (q, k, v, lse) residuals —
O(T) memory in both directions, never materializing the (T, S) score matrix
(the reference gets both directions from SDPA's CUDA kernels,
lit_llama/model.py:230). ``D = rowsum(dO ∘ O)`` is precomputed in XLA; the
dQ kernel sweeps KV blocks j <= i, the dK/dV kernel sweeps Q blocks i >= j,
each carrying an fp32 accumulator across its inner grid dimension.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Block-size caps, tunable for experiments. Measured on one v5e (0.44B train
# step, T=2048): 128x128 blocks leave the step at ~48 TFLOP/s because each of
# the thousands of grid cells pays a fixed latency; 512x512 reaches
# ~64 TFLOP/s (+28% tokens/sec) and 1024 adds nothing. 512 keeps diagonal-
# block causal waste lower at long T and VMEM modest.
DEFAULT_BLOCK_Q = int(os.environ.get("LIT_LLAMA_TPU_FLASH_BLOCK_Q", "512"))
DEFAULT_BLOCK_K = int(os.environ.get("LIT_LLAMA_TPU_FLASH_BLOCK_K", "512"))


def _pick_block(n: int, cap: int) -> int:
    """Largest block <= cap that divides n (the dispatch guarantees n % 128 == 0).
    Bigger blocks mean fewer grid cells — each cell pays a fixed MXU/scheduling
    latency that dominates at (128, 128) tiles."""
    for b in (cap, 512, 256, 128):
        if b <= cap and n % b == 0:
            return b
    return min(n, 128)


NEG_INF = float(-1e30)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref, *, scale, block_q, block_k):
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
        l = jnp.maximum(l_ref[:], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / l).astype(o_ref.dtype)
        # logsumexp per row — the only residual the backward needs beyond o
        lse_ref[0, 0] = m_ref[:] + jnp.log(l)


def _flash_forward(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, block_q: int, block_k: int
):
    """Returns (o, lse); lse (B, H, T, 1) f32 = logsumexp of scaled scores."""
    B, H, T, hs = q.shape
    S = k.shape[2]
    block_q = _pick_block(T, block_q)
    block_k = _pick_block(S, block_k)
    # the diagonal-block causal masks and block-skip predicates assume square
    # blocks (jk < iq / row >= col are block-local); unequal env knobs would
    # silently skip visible KV blocks, so clamp both to the smaller pick
    # (picks are powers of two, so the min divides both T and S)
    if block_q != block_k:
        block_q = block_k = min(block_q, block_k)
    scale = 1.0 / (hs**0.5)
    grid = (B, H, pl.cdiv(T, block_q), pl.cdiv(S, block_k))
    kernel = functools.partial(
        _flash_kernel, scale=scale, block_q=block_q, block_k=block_k
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((B, H, T, 1), jnp.float32),
        ),
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
        out_specs=(
            pl.BlockSpec(
                (1, 1, block_q, hs), lambda b, h, i, j: (b, h, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_q, 1), lambda b, h, i, j: (b, h, i, 0),
                memory_space=pltpu.VMEM,
            ),
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


# ---------------------------------------------------------------------------
# Backward: flash2 recompute scheme, two kernels
# ---------------------------------------------------------------------------


def _causal_p(q, k, lse, scale, iq, jk, block_q, block_k):
    """Recompute the probability tile P = exp(S - lse) with the causal mask."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    s = jnp.where(jnp.logical_or(jk < iq, row >= col), s, NEG_INF)
    return jnp.exp(s - lse)


def _flash_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref, dq_ref, acc_ref,
    *, scale, block_q, block_k,
):
    """dQ_i = Σ_{j<=i} (P_ij ∘ (dO_i V_jᵀ - D_i)) K_j · scale; KV innermost."""
    iq = pl.program_id(2)
    jk = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(jk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(jk <= iq)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        p = _causal_p(q, k, lse_ref[0, 0], scale, iq, jk, block_q, block_k)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k)
        ds = p * (dp - dd_ref[0, 0])
        acc_ref[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(jk == nk - 1)
    def _finalize():
        dq_ref[0, 0] = acc_ref[:].astype(dq_ref.dtype)


def _flash_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref, dk_ref, dv_ref,
    dk_acc_ref, dv_acc_ref, *, scale, block_q, block_k,
):
    """dV_j = Σ_{i>=j} P_ijᵀ dO_i;  dK_j = Σ_{i>=j} (P ∘ (dO Vᵀ - D))ᵀ Q_i · scale;
    Q innermost."""
    jk = pl.program_id(2)
    iq = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(iq == 0)
    def _init():
        dk_acc_ref[:] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[:] = jnp.zeros_like(dv_acc_ref)

    @pl.when(iq >= jk)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        p = _causal_p(q, k, lse_ref[0, 0], scale, iq, jk, block_q, block_k)
        pt = p.astype(do.dtype)
        dv_acc_ref[:] += jax.lax.dot_general(
            pt, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_k, hs)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - dd_ref[0, 0])).astype(q.dtype)
        dk_acc_ref[:] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc_ref[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc_ref[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, o, lse, do, block_q, block_k):
    B, H, T, hs = q.shape
    S = k.shape[2]
    block_q = _pick_block(T, block_q)
    block_k = _pick_block(S, block_k)
    if block_q != block_k:  # square blocks — see _flash_forward
        block_q = block_k = min(block_q, block_k)
    scale = 1.0 / (hs**0.5)
    # D_i = rowsum(dO ∘ O) — cheap elementwise reduction, XLA fuses it
    dd = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True)

    qspec = pl.BlockSpec(
        (1, 1, block_q, hs), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM
    )
    kspec = pl.BlockSpec(
        (1, 1, block_k, hs), lambda b, h, i, j: (b, h, j, 0), memory_space=pltpu.VMEM
    )
    rowspec = pl.BlockSpec(
        (1, 1, block_q, 1), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM
    )
    dq = pl.pallas_call(
        functools.partial(
            _flash_dq_kernel, scale=scale, block_q=block_q, block_k=block_k
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(B, H, pl.cdiv(T, block_q), pl.cdiv(S, block_k)),
        in_specs=[qspec, kspec, kspec, qspec, rowspec, rowspec],
        out_specs=qspec,
        scratch_shapes=[pltpu.VMEM((block_q, hs), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * B * H * T * S * hs // 2,
            bytes_accessed=(4 * B * H * T * hs + 2 * B * H * S * hs) * q.dtype.itemsize,
            transcendentals=B * H * T * S // 2,
        ),
    )(q, k, v, do, lse, dd)

    # dK/dV sweep: note the grid puts KV blocks second, Q blocks innermost,
    # so the index maps read (b, h, j, i)
    qspec_t = pl.BlockSpec(
        (1, 1, block_q, hs), lambda b, h, j, i: (b, h, i, 0), memory_space=pltpu.VMEM
    )
    kspec_t = pl.BlockSpec(
        (1, 1, block_k, hs), lambda b, h, j, i: (b, h, j, 0), memory_space=pltpu.VMEM
    )
    rowspec_t = pl.BlockSpec(
        (1, 1, block_q, 1), lambda b, h, j, i: (b, h, i, 0), memory_space=pltpu.VMEM
    )
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_dkv_kernel, scale=scale, block_q=block_q, block_k=block_k
        ),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(B, H, pl.cdiv(S, block_k), pl.cdiv(T, block_q)),
        in_specs=[qspec_t, kspec_t, kspec_t, qspec_t, rowspec_t, rowspec_t],
        out_specs=(kspec_t, kspec_t),
        scratch_shapes=[
            pltpu.VMEM((block_k, hs), jnp.float32),
            pltpu.VMEM((block_k, hs), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * B * H * T * S * hs // 2,
            bytes_accessed=(4 * B * H * T * hs + 4 * B * H * S * hs) * q.dtype.itemsize,
            transcendentals=B * H * T * S // 2,
        ),
    )(q, k, v, do, lse, dd)
    return dq, dk, dv


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
            return _flash_forward(q, k, v, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K)[0]
    return _flash_forward(q, k, v, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K)[0]


def _fwd(q, k, v, causal, interpret):
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            o, lse = _flash_forward(q, k, v, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K)
    else:
        o, lse = _flash_forward(q, k, v, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K)
    return o, (q, k, v, o, lse)


def _bwd(causal, interpret, res, g):
    q, k, v, o, lse = res
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            return _flash_backward(q, k, v, o, lse, g, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K)
    return _flash_backward(q, k, v, o, lse, g, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K)


flash_attention.defvjp(_fwd, _bwd)
