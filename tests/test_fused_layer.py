"""Whole-layer fused decode kernel (ops/fused_layer.py): parity against the
standard XLA block in the half-rotation basis, and the basis change itself
against the interleaved model. Interpret mode on CPU; Mosaic legality is
validated on chip (tpu CI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from lit_llama_tpu import LLaMAConfig, forward, init_params
from lit_llama_tpu.models import llama
from lit_llama_tpu.ops import fused_layer
from lit_llama_tpu.ops.rope import build_rope_cache, rope_half_row


def tiny_config(**kw):
    # head_size must be 128 for the fused kernel's rope lane roll
    return LLaMAConfig(
        block_size=256,
        vocab_size=128,
        n_layer=2,
        n_head=4,
        n_embd=512,
        quantize="int4",
        quant_groupsize=128,
        **kw,
    )


@pytest.fixture(scope="module")
def prepared():
    cfg = tiny_config()
    dense = init_params(cfg.replace(quantize=None), jax.random.PRNGKey(0))
    qparams = llama.quantize_params(dense, cfg)
    qparams = llama.unstack_layers(qparams)
    assert fused_layer.fused_layer_supported(cfg, qparams)
    fparams, fcfg = fused_layer.prepare_fused_params(qparams, cfg)
    return cfg, qparams, fparams, fcfg


def test_half_basis_forward_equivalence(prepared):
    """Permuted q/k columns + half-basis rope == original model exactly (the
    permutation only reorders the rotation pairs both q and k share)."""
    cfg, qparams, fparams, fcfg = prepared
    toks = jnp.asarray([[3, 17, 42, 99, 7]], jnp.int32)
    ref, _ = forward(qparams, toks, cfg)
    got, _ = forward(fparams, toks, fcfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def _xla_block_step(lp, x, pos, kv, cfg, S):
    """Single-token slot decode through the standard XLA block (the numerical
    reference for the fused kernel), ring-buffer write like the slot_pos path."""
    rope_cache = build_rope_cache(cfg.block_size, cfg.head_size)
    p = jnp.clip(pos, 0, cfg.block_size - 1)
    rope = jnp.take(rope_cache, p[None], axis=0)[:, None]  # (1, 1, hs/2, 2)
    mask = (jnp.arange(S) <= pos)[None, None, None, :]  # (B=1, 1, 1, S)
    out, new_kv = llama._block(
        lp, x[None], rope, mask, cfg, kv, pos % S, causal=False
    )
    return out[0], new_kv


def test_decode_layer_fused_odd_half_group_count():
    """Geometry with an ODD per-plane group count (like 7B's mlp.c_proj, 43):
    exercises the non-8-aligned scale-plane slicing."""
    cfg = LLaMAConfig(
        block_size=64, vocab_size=64, n_layer=1, n_head=6, n_embd=768,
        quantize="int4", quant_groupsize=128,
    )
    assert (cfg.n_embd // cfg.quant_groupsize) // 2 % 2 == 1  # Gh = 3
    dense = init_params(cfg.replace(quantize=None), jax.random.PRNGKey(2))
    qparams = llama.unstack_layers(llama.quantize_params(dense, cfg))
    assert fused_layer.fused_layer_supported(cfg, qparams)
    fparams, fcfg = fused_layer.prepare_fused_params(qparams, cfg)
    D, H, hs, S = cfg.n_embd, cfg.n_head, cfg.head_size, 32
    rng = np.random.default_rng(5)
    kv = {
        "k": jnp.asarray(rng.normal(size=(1, H, S, hs)) * 0.3, jnp.float32),
        "v": jnp.asarray(rng.normal(size=(1, H, S, hs)) * 0.3, jnp.float32),
    }
    x = jnp.asarray(rng.normal(size=(1, D)) * 0.5, jnp.float32)
    lp = fparams["h"][0]
    pos = jnp.int32(9)
    ref_out, ref_kv = _xla_block_step(lp, x, pos, kv, fcfg, S)
    rope_cache = build_rope_cache(fcfg.block_size, hs)
    cosf, sinf = rope_half_row(rope_cache, pos, hs)
    with pltpu.force_tpu_interpret_mode():
        got_out, got_kv = fused_layer.decode_layer_fused(
            x, lp, kv, cosf, sinf, pos % S, pos, fcfg
        )
    np.testing.assert_allclose(
        np.asarray(got_kv["k"]), np.asarray(ref_kv["k"]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_out), np.asarray(ref_out), rtol=2e-3, atol=2e-3
    )


@pytest.mark.parametrize("pos", [0, 37, 127, 256 + 3])
def test_decode_layer_fused_matches_xla(prepared, pos):
    cfg, _, fparams, fcfg = prepared
    D, H, hs = cfg.n_embd, cfg.n_head, cfg.head_size
    S = 128
    rng = np.random.default_rng(pos + 1)
    kv = {
        "k": jnp.asarray(rng.normal(size=(1, H, S, hs)) * 0.3, jnp.float32),
        "v": jnp.asarray(rng.normal(size=(1, H, S, hs)) * 0.3, jnp.float32),
    }
    x = jnp.asarray(rng.normal(size=(1, D)) * 0.5, jnp.float32)
    lp = fparams["h"][0]

    pos_arr = jnp.int32(pos)
    ref_out, ref_kv = _xla_block_step(lp, x, pos_arr, kv, fcfg, S)

    rope_cache = build_rope_cache(fcfg.block_size, hs)
    cosf, sinf = rope_half_row(
        rope_cache, jnp.clip(pos_arr, 0, fcfg.block_size - 1), hs
    )
    with pltpu.force_tpu_interpret_mode():
        got_out, got_kv = fused_layer.decode_layer_fused(
            x, lp, kv, cosf, sinf, pos_arr % S, pos_arr, fcfg
        )

    np.testing.assert_allclose(
        np.asarray(got_kv["k"]), np.asarray(ref_kv["k"]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_kv["v"]), np.asarray(ref_kv["v"]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_out), np.asarray(ref_out), rtol=2e-3, atol=2e-3
    )


def test_fused_generate_matches_standard(prepared):
    """End-to-end greedy decode through the fused per-layer kernel equals the
    standard XLA decode loop on the same quantized weights — including
    generation PAST the cache (ring buffer vs the reference's roll: identical
    retained window)."""
    from lit_llama_tpu.models import generate as gen

    cfg, qparams, fparams, fcfg = prepared
    prompt = np.asarray([5, 23, 81, 2, 40], np.int32)
    S = 16
    n_new = 2 * S  # runs well past the cache
    ref = gen.generate(
        qparams, prompt, n_new, config=cfg, max_seq_length=S, temperature=0.0
    )
    with pltpu.force_tpu_interpret_mode():
        got = gen.generate(
            fparams, prompt, n_new, config=fcfg, max_seq_length=S, temperature=0.0
        )
    assert got.tolist() == ref.tolist()


def test_engine_batched_fused_kernels_match(prepared, monkeypatch):
    """The serving engine routed through the batched fused path (block-head
    kernel -> write+attention kernel -> block-tail kernel, 3 launches/block)
    matches the standard XLA engine greedy token-for-token."""
    from lit_llama_tpu.models.generate import generate
    from lit_llama_tpu.ops import fused_layer as fl
    from lit_llama_tpu.serve.engine import DecodeEngine

    cfg, qparams, fparams, fcfg = prepared
    monkeypatch.setattr(
        fl,
        "use_serve_fused",
        lambda config, lp: config.rope_layout == "half"
        and "qzero" in lp["attn"]["c_attn"]
        and "c_fc12" in lp["mlp"],
    )
    rng = np.random.default_rng(21)
    prompts = [rng.integers(1, 128, size=n).astype(np.int32) for n in (5, 11, 3)]
    expected = [
        generate(
            qparams, p, 6, config=cfg, max_seq_length=64, temperature=0.0
        )[len(p):].tolist()
        for p in prompts
    ]
    with pltpu.force_tpu_interpret_mode():
        eng = DecodeEngine(fparams, fcfg, max_batch=3, max_seq_length=64)
        ids = [eng.submit(p, 6) for p in prompts]
        done = eng.run()
    for rid, exp in zip(ids, expected):
        assert done[rid].generated == exp, rid


def test_engine_batched_fused_long_generation(prepared, monkeypatch):
    """Batched fused kernels + per-slot ring wrap: a request generating past
    the cache length through block_head/write+attention/block_tail matches the
    single-stream rolling reference."""
    from lit_llama_tpu.models.generate import generate
    from lit_llama_tpu.ops import fused_layer as fl
    from lit_llama_tpu.serve.engine import DecodeEngine

    cfg, qparams, fparams, fcfg = prepared
    monkeypatch.setattr(
        fl,
        "use_serve_fused",
        lambda config, lp: config.rope_layout == "half"
        and "qzero" in lp["attn"]["c_attn"],
    )
    S = 16
    prompt = np.asarray([5, 23, 81, 2, 40], np.int32)
    n_new = 2 * S
    expected = generate(
        qparams, prompt, n_new, config=cfg, max_seq_length=S, temperature=0.0
    )[len(prompt):].tolist()
    with pltpu.force_tpu_interpret_mode():
        eng = DecodeEngine(fparams, fcfg, max_batch=2, max_seq_length=S)
        rid = eng.submit(prompt, n_new)
        done = eng.run()
    assert done[rid].generated == expected


def test_rope_half_row_matches_apply_rope_half(prepared):
    """The one-roll kernel rotation (q*cos + roll(q)*sin_signed) equals
    apply_rope_half."""
    from lit_llama_tpu.ops.rope import apply_rope_half

    cfg = prepared[0]
    hs = cfg.head_size
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, 1, 3, hs)), jnp.float32)
    rope_cache = build_rope_cache(64, hs)
    pos = jnp.int32(11)
    rope = jnp.take(rope_cache, pos[None], axis=0)
    ref = apply_rope_half(q, rope)
    cosf, sinf = rope_half_row(rope_cache, pos, hs)
    rolled = jnp.roll(q, hs // 2, axis=-1)
    got = q * cosf.reshape(1, 1, 1, hs) + rolled * sinf.reshape(1, 1, 1, hs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)
