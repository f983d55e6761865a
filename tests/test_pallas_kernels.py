"""Pallas kernels vs the XLA reference paths, in interpreter mode on CPU
(mirrors the reference's strategy of testing the Triton kernel against the
dequantize+F.linear fallback, lit_llama/quantization.py:339-340)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lit_llama_tpu.ops import linear as linear_ops
from lit_llama_tpu.ops import quant_matmul
from lit_llama_tpu.ops import quant_matmul_pallas as qmp
from lit_llama_tpu.ops.attention import attention_xla
from lit_llama_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize("M", [1, 4, 9])
def test_int8_kernel_matches_xla(rng, M):
    K, N = 512, 256
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)) * 0.02, jnp.float32)
    q = linear_ops.quantize_int8(w)
    ref = quant_matmul.matmul_int8_xla(x, q["qw"], q["qscale"], jnp.float32)
    got = qmp.matmul_int8(x, q["qw"], q["qscale"], jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("M", [1, 4])
def test_int4_kernel_matches_xla(rng, M):
    K, N, gs = 512, 256, 128
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)) * 0.02, jnp.float32)
    q = linear_ops.quantize_int4(w, groupsize=gs)
    ref = quant_matmul.matmul_int4_xla(
        x, q["qw"], q["qscale"], q["qzero"], jnp.float32
    )
    got = qmp.matmul_int4(
        x, q["qw"], q["qscale"], q["qzero"], jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-2, rtol=3e-2)


def test_int4_kernel_batched_input(rng):
    """(B, T, K) leading dims collapse correctly."""
    K, N, gs = 256, 256, 128
    x = jnp.asarray(rng.normal(size=(2, 3, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)) * 0.02, jnp.float32)
    q = linear_ops.quantize_int4(w, groupsize=gs)
    ref = quant_matmul.matmul_int4_xla(x, q["qw"], q["qscale"], q["qzero"], jnp.float32)
    got = qmp.matmul_int4(
        x, q["qw"], q["qscale"], q["qzero"], jnp.float32, interpret=True
    )
    assert got.shape == (2, 3, N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-2, rtol=3e-2)


def test_flash_attention_matches_xla(rng):
    B, H, T, hs = 1, 2, 256, 128
    q = jnp.asarray(rng.normal(size=(B, H, T, hs)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, T, hs)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, T, hs)), jnp.float32)
    mask = jnp.tril(jnp.ones((T, T), bool))[None, None]
    ref = attention_xla(q, k, v, mask)
    got = flash_attention(q, k, v, True, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("T", [128, 384])
def test_flash_attention_grad_matches_xla(rng, T):
    """Pallas flash2 backward (dq/dk/dv kernels) vs the XLA einsum grads —
    multi-block T exercises the cross-block accumulators and causal skipping."""
    B, H, hs = 1, 1, 128
    q = jnp.asarray(rng.normal(size=(B, H, T, hs)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, T, hs)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, T, hs)), jnp.float32)
    mask = jnp.tril(jnp.ones((T, T), bool))[None, None]

    def f_flash(q, k, v):
        return (flash_attention(q, k, v, True, True) ** 2).sum()

    def f_ref(q, k, v):
        return (attention_xla(q, k, v, mask) ** 2).sum()

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("N", [1088, 320])
def test_int4_kernel_non_divisible_N(rng, N):
    """Output widths that do not divide the N block: the edge block must be
    computed, not silently dropped (regression: fc 11008 / lm_head 32000)."""
    K, gs = 256, 64
    x = jnp.asarray(rng.normal(size=(2, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)) * 0.02, jnp.float32)
    q = linear_ops.quantize_int4(w, groupsize=gs)
    ref = quant_matmul.matmul_int4_xla(x, q["qw"], q["qscale"], q["qzero"], jnp.float32)
    got = qmp.matmul_int4(
        x, q["qw"], q["qscale"], q["qzero"], jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-2, rtol=3e-2)


def test_int8_kernel_non_divisible_N(rng):
    K, N = 512, 1088
    x = jnp.asarray(rng.normal(size=(3, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)) * 0.02, jnp.float32)
    q = linear_ops.quantize_int8(w)
    ref = quant_matmul.matmul_int8_xla(x, q["qw"], q["qscale"], jnp.float32)
    got = qmp.matmul_int8(x, q["qw"], q["qscale"], jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("K", [768, 11008])
def test_int8_kernel_non_divisible_K(rng, K):
    """K that 512 does not divide (7B MLP down-projection is K=11008,
    11008 % 512 == 256): a floored K grid silently dropped the remainder
    rows (advisor round-1 high finding). block_k must divide K."""
    N = 256
    x = jnp.asarray(rng.normal(size=(2, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)) * 0.02, jnp.float32)
    q = linear_ops.quantize_int8(w)
    ref = quant_matmul.matmul_int8_xla(x, q["qw"], q["qscale"], jnp.float32)
    got = qmp.matmul_int8(x, q["qw"], q["qscale"], jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_int4_kernel_single_group(rng):
    """groupsize == -1 (one group spanning the whole contraction dim)."""
    K, N = 128, 256
    x = jnp.asarray(rng.normal(size=(2, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)) * 0.02 + 0.01, jnp.float32)
    q = linear_ops.quantize_int4(w, groupsize=-1)
    assert q["qscale"].shape[0] == 1
    ref = quant_matmul.matmul_int4_xla(x, q["qw"], q["qscale"], q["qzero"], jnp.float32)
    got = qmp.matmul_int4(
        x, q["qw"], q["qscale"], q["qzero"], jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("M,K,N", [(256, 512, 384), (2048, 512, 256)])
def test_int4_kernel_large_M(rng, M, K, N):
    """Prefill/training sizes: the VMEM-aware schedule must stay exact at
    M in {256, 2048} (VERDICT r1 missing #5 — large-M fused path)."""
    from lit_llama_tpu.ops.linear import quantize_int4
    from lit_llama_tpu.ops.quant_matmul import matmul_int4_xla
    from lit_llama_tpu.ops.quant_matmul_pallas import matmul_int4

    w = jnp.asarray(rng.normal(size=(K, N)) * 0.05, jnp.float32)
    q = quantize_int4(w, groupsize=64)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    ref = matmul_int4_xla(x, q["qw"], q["qscale"], q["qzero"], jnp.float32)
    got = matmul_int4(
        x, q["qw"], q["qscale"], q["qzero"], jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_int4_kernel_prime_group_count_large_M(rng):
    """K/gs/2 prime (the 7B mlp.c_proj case, 43 half-groups): K stays untiled
    and the block shrinker must still produce a valid, exact schedule."""
    from lit_llama_tpu.ops.linear import quantize_int4
    from lit_llama_tpu.ops.quant_matmul import matmul_int4_xla
    from lit_llama_tpu.ops.quant_matmul_pallas import matmul_int4

    K, N, M = 32 * 14, 256, 256  # n_groups=14 -> n_half=7 (prime, not mult of 8)
    w = jnp.asarray(rng.normal(size=(K, N)) * 0.05, jnp.float32)
    q = quantize_int4(w, groupsize=32)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    ref = matmul_int4_xla(x, q["qw"], q["qscale"], q["qzero"], jnp.float32)
    got = matmul_int4(
        x, q["qw"], q["qscale"], q["qzero"], jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("B,limits", [(1, [0]), (1, [127]), (3, [0, 64, 255])])
def test_decode_attention_bf16_matches_xla(rng, B, limits):
    """Pallas decode attention (one query vs the whole cache, per-slot
    visibility limit) vs the masked XLA einsum path."""
    from lit_llama_tpu.ops.decode_attention import decode_attention_pallas

    H, S, hs = 4, 256, 128
    q = jnp.asarray(rng.normal(size=(B, H, 1, hs)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, S, hs)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, S, hs)), jnp.float32)
    limit = jnp.asarray(limits, jnp.int32)
    mask = (jnp.arange(S)[None, :] <= limit[:, None])[:, None, None, :]
    ref = attention_xla(q, k, v, mask)
    got = decode_attention_pallas(q, k, v, None, None, limit, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_decode_attention_int8_matches_dequant_xla(rng):
    """int8 cache consumed directly: scores/weighted-sum with folded scales
    must match dequantize-then-attend."""
    from lit_llama_tpu.ops.decode_attention import decode_attention_pallas

    B, H, S, hs = 2, 8, 128, 128
    q = jnp.asarray(rng.normal(size=(B, H, 1, hs)), jnp.float32)
    kf = rng.normal(size=(B, H, S, hs)).astype(np.float32)
    vf = rng.normal(size=(B, H, S, hs)).astype(np.float32)
    ks = np.abs(kf).max(-1, keepdims=True) / 127.0
    vs = np.abs(vf).max(-1, keepdims=True) / 127.0
    k8 = np.clip(np.round(kf / ks), -127, 127).astype(np.int8)
    v8 = np.clip(np.round(vf / vs), -127, 127).astype(np.int8)
    limit = jnp.asarray([100, 5], jnp.int32)
    mask = (jnp.arange(S)[None, :] <= limit[:, None])[:, None, None, :]
    kd = jnp.asarray(k8.astype(np.float32) * ks)
    vd = jnp.asarray(v8.astype(np.float32) * vs)
    ref = attention_xla(q, kd, vd, mask)
    got = decode_attention_pallas(
        q, jnp.asarray(k8), jnp.asarray(v8), jnp.asarray(ks), jnp.asarray(vs),
        limit, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("positions", [[0, 5, 255], [256 + 7, 3, 511 + 256]])
def test_decode_attention_write_matches_scatter_plus_xla(rng, positions):
    """Fused per-slot cache write + attention (serving path) vs the separate
    scatter + masked einsum: identical updated cache, matching outputs.
    Positions past S wrap as a ring (row pos % S overwritten)."""
    from lit_llama_tpu.ops.decode_attention import decode_attention_write_pallas

    B, H, S, hs = len(positions), 4, 256, 128
    q = jnp.asarray(rng.normal(size=(B, H, 1, hs)), jnp.float32)
    knew = jnp.asarray(rng.normal(size=(B, H, 1, hs)), jnp.float32)
    vnew = jnp.asarray(rng.normal(size=(B, H, 1, hs)), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(B, H, S, hs)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(B, H, S, hs)), jnp.float32)
    pos = jnp.asarray(positions, jnp.int32)

    # reference: scatter write then masked attention over the updated cache
    wp = pos % S
    kc_ref = kc.at[jnp.arange(B), :, wp].set(knew[:, :, 0])
    vc_ref = vc.at[jnp.arange(B), :, wp].set(vnew[:, :, 0])
    mask = (jnp.arange(S)[None, :] <= pos[:, None])[:, None, None, :]
    y_ref = attention_xla(q, kc_ref, vc_ref, mask)

    y, kc2, vc2 = decode_attention_write_pallas(
        q, knew, vnew, kc, vc, pos, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(kc2), np.asarray(kc_ref))
    np.testing.assert_array_equal(np.asarray(vc2), np.asarray(vc_ref))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("positions", [[0, 5, 255], [256 + 7, 3, 511 + 256]])
def test_decode_attention_write_packed_matches_scatter_plus_xla(rng, positions):
    """Packed bf16-pair cache (uint32 words — the on-chip serving layout, see
    ops/fused_layer.py): fused write+attention vs scatter + masked einsum on
    the equivalent bf16 cache. Cache updates are bit-exact through the pair
    words; outputs match within bf16 attention tolerance."""
    from lit_llama_tpu.ops.decode_attention import decode_attention_write_pallas
    from lit_llama_tpu.ops.fused_layer import pack_kv, unpack_kv

    B, H, S, hs = len(positions), 4, 256, 128
    q = jnp.asarray(rng.normal(size=(B, H, 1, hs)), jnp.bfloat16)
    knew = jnp.asarray(rng.normal(size=(B, H, 1, hs)), jnp.bfloat16)
    vnew = jnp.asarray(rng.normal(size=(B, H, 1, hs)), jnp.bfloat16)
    kc = jnp.asarray(rng.normal(size=(B, H, S, hs)), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(B, H, S, hs)), jnp.bfloat16)
    pos = jnp.asarray(positions, jnp.int32)

    wp = pos % S
    kc_ref = kc.at[jnp.arange(B), :, wp].set(knew[:, :, 0])
    vc_ref = vc.at[jnp.arange(B), :, wp].set(vnew[:, :, 0])
    mask = (jnp.arange(S)[None, :] <= pos[:, None])[:, None, None, :]
    y_ref = attention_xla(q, kc_ref, vc_ref, mask)

    y, kc2, vc2 = decode_attention_write_pallas(
        q, knew, vnew, pack_kv(kc), pack_kv(vc), pos, interpret=True
    )
    assert kc2.dtype == jnp.uint32
    np.testing.assert_array_equal(
        np.asarray(unpack_kv(kc2), np.float32), np.asarray(kc_ref, np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(unpack_kv(vc2), np.float32), np.asarray(vc_ref, np.float32)
    )
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        atol=0.02, rtol=0.02,
    )


@pytest.mark.parametrize("mxu", [True, False])
@pytest.mark.parametrize("positions", [[0, 5, 255], [256 + 7, 3, 511 + 256]])
def test_decode_attention_write_pipelined_matches(rng, positions, mxu):
    """BlockSpec-pipelined batched write+attention (both the MXU dot_general
    and VPU multiply-reduce formulations) vs scatter + masked einsum — f32
    direct cache."""
    from lit_llama_tpu.ops.decode_attention import decode_attention_write_pipelined

    B, H, S, hs = len(positions), 4, 256, 128
    q = jnp.asarray(rng.normal(size=(B, H, 1, hs)), jnp.float32)
    knew = jnp.asarray(rng.normal(size=(B, H, 1, hs)), jnp.float32)
    vnew = jnp.asarray(rng.normal(size=(B, H, 1, hs)), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(B, H, S, hs)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(B, H, S, hs)), jnp.float32)
    pos = jnp.asarray(positions, jnp.int32)

    wp = pos % S
    kc_ref = kc.at[jnp.arange(B), :, wp].set(knew[:, :, 0])
    vc_ref = vc.at[jnp.arange(B), :, wp].set(vnew[:, :, 0])
    mask = (jnp.arange(S)[None, :] <= pos[:, None])[:, None, None, :]
    y_ref = attention_xla(q, kc_ref, vc_ref, mask)

    y, kc2, vc2 = decode_attention_write_pipelined(
        q, knew, vnew, kc, vc, pos, mxu=mxu, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(kc2), np.asarray(kc_ref))
    np.testing.assert_array_equal(np.asarray(vc2), np.asarray(vc_ref))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("mxu", [True, False])
@pytest.mark.parametrize("positions", [[0, 5, 255], [256 + 7, 3, 511 + 256]])
def test_decode_attention_write_pipelined_packed_matches(rng, positions, mxu):
    """Pipelined kernel against the packed bf16-pair uint32 cache (the on-chip
    serving layout): bit-exact cache update, bf16-tolerance outputs."""
    from lit_llama_tpu.ops.decode_attention import decode_attention_write_pipelined
    from lit_llama_tpu.ops.fused_layer import pack_kv, unpack_kv

    B, H, S, hs = len(positions), 4, 256, 128
    q = jnp.asarray(rng.normal(size=(B, H, 1, hs)), jnp.bfloat16)
    knew = jnp.asarray(rng.normal(size=(B, H, 1, hs)), jnp.bfloat16)
    vnew = jnp.asarray(rng.normal(size=(B, H, 1, hs)), jnp.bfloat16)
    kc = jnp.asarray(rng.normal(size=(B, H, S, hs)), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(B, H, S, hs)), jnp.bfloat16)
    pos = jnp.asarray(positions, jnp.int32)

    wp = pos % S
    kc_ref = kc.at[jnp.arange(B), :, wp].set(knew[:, :, 0])
    vc_ref = vc.at[jnp.arange(B), :, wp].set(vnew[:, :, 0])
    mask = (jnp.arange(S)[None, :] <= pos[:, None])[:, None, None, :]
    y_ref = attention_xla(q, kc_ref, vc_ref, mask)

    y, kc2, vc2 = decode_attention_write_pipelined(
        q, knew, vnew, pack_kv(kc), pack_kv(vc), pos, mxu=mxu, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(unpack_kv(kc2), np.float32), np.asarray(kc_ref, np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(unpack_kv(vc2), np.float32), np.asarray(vc_ref, np.float32)
    )
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        atol=0.02, rtol=0.02,
    )
