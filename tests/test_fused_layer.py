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
        lambda config, lp, batch=None: config.rope_layout == "half"
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
        lambda config, lp, batch=None: config.rope_layout == "half"
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


# ---------------------------------------------------------------------------
# Packed bf16-pair cache (uint32 words): the layout the bf16 fused path uses
# on chip, because this Mosaic toolchain rejects sub-32-bit dynamic-offset
# DMAs (see ops/fused_layer.py module docstring).
# ---------------------------------------------------------------------------


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, 10, 128)), jnp.bfloat16)
    w = fused_layer.pack_kv(x)
    assert w.shape == (2, 3, 5, 128) and w.dtype == jnp.uint32
    np.testing.assert_array_equal(
        np.asarray(fused_layer.unpack_kv(w), np.float32), np.asarray(x, np.float32)
    )


@pytest.fixture(scope="module")
def prepared_bf16():
    cfg = tiny_config(param_dtype="bfloat16", compute_dtype="bfloat16")
    dense = init_params(cfg.replace(quantize=None), jax.random.PRNGKey(0))
    qparams = llama.unstack_layers(llama.quantize_params(dense, cfg))
    fparams, fcfg = fused_layer.prepare_fused_params(qparams, cfg)
    return cfg, qparams, fparams, fcfg


@pytest.mark.parametrize("pos", [0, 37, 128 + 3])
def test_decode_layer_fused_packed_matches_xla(prepared_bf16, pos):
    """Packed-cache fused layer vs the XLA block holding a bf16 cache: the
    stored k/v values are IDENTICAL (same bf16 rounding, pair words unpack
    exactly), and the layer output matches within bf16 tolerance."""
    cfg, _, fparams, fcfg = prepared_bf16
    D, H, hs = cfg.n_embd, cfg.n_head, cfg.head_size
    S = 64
    rng = np.random.default_rng(pos + 1)
    kv = {
        "k": jnp.asarray(rng.normal(size=(1, H, S, hs)) * 0.3, jnp.bfloat16),
        "v": jnp.asarray(rng.normal(size=(1, H, S, hs)) * 0.3, jnp.bfloat16),
    }
    kvp = {n: fused_layer.pack_kv(c) for n, c in kv.items()}
    x = jnp.asarray(rng.normal(size=(1, D)) * 0.5, jnp.bfloat16)
    lp = fparams["h"][0]

    pos_arr = jnp.int32(pos)
    ref_out, ref_kv = _xla_block_step(lp, x, pos_arr, kv, fcfg, S)

    rope_cache = build_rope_cache(fcfg.block_size, hs)
    cosf, sinf = rope_half_row(
        rope_cache, jnp.clip(pos_arr, 0, fcfg.block_size - 1), hs
    )
    with pltpu.force_tpu_interpret_mode():
        got_out, got_kvp = fused_layer.decode_layer_fused(
            x, lp, kvp, cosf, sinf, pos_arr % S, pos_arr, fcfg
        )

    assert got_kvp["k"].dtype == jnp.uint32
    wp = pos % S
    for name in ("k", "v"):
        got_c = np.asarray(fused_layer.unpack_kv(got_kvp[name]), np.float32)
        ref_c = np.asarray(ref_kv[name], np.float32)
        keep = np.arange(S) != wp
        # untouched rows: bit-exact through the pair words
        np.testing.assert_array_equal(got_c[:, :, keep], ref_c[:, :, keep])
        # the written row: the kernel keeps qkv f32 through rope and rounds
        # once; XLA rounds the matvec to bf16 first — ±1 ulp
        np.testing.assert_allclose(
            got_c[:, :, wp], ref_c[:, :, wp], atol=0.02, rtol=0.02
        )
    np.testing.assert_allclose(
        np.asarray(got_out, np.float32),
        np.asarray(ref_out, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_fused_generate_packed_long_prefix(prepared_bf16):
    """bf16 end-to-end greedy decode through the packed fused path vs the XLA
    loop: the fused path carries the residual stream in f32 (XLA rounds each
    add to bf16), so a greedy near-tie can flip a late token — require a long
    exact prefix (the f32 parity test above is exact)."""
    from lit_llama_tpu.models import generate as gen

    cfg, qparams, fparams, fcfg = prepared_bf16
    prompt = np.asarray([5, 23, 81, 2, 40], np.int32)
    ref = gen.generate(
        qparams, prompt, 12, config=cfg, max_seq_length=32, temperature=0.0
    )
    with pltpu.force_tpu_interpret_mode():
        got = gen.generate(
            fparams, prompt, 12, config=fcfg, max_seq_length=32, temperature=0.0
        )
    prefix = 0
    for a, b in zip(got.tolist(), ref.tolist()):
        if a != b:
            break
        prefix += 1
    assert prefix >= len(prompt) + 8, (got.tolist(), ref.tolist())


@pytest.mark.parametrize("T", [6, 7])
def test_packed_prefill_write_matches_bf16_cache(prepared_bf16, T):
    """llama.forward prefill-from-zero into a packed cache stores exactly the
    rows the bf16 cache path stores (odd prompt lengths pad the trailing
    half-word with garbage at position T, which is invisible until the first
    decode step overwrites it)."""
    cfg, _, fparams, fcfg = prepared_bf16
    S = 16
    toks = jnp.asarray(np.arange(1, T + 1)[None], jnp.int32)
    cache_b = llama.unstack_kv_cache(llama.init_kv_cache(fcfg, 1, S))
    cache_p = llama.unstack_kv_cache(llama.init_kv_cache(fcfg, 1, S, packed=True))
    logits_b, new_b = forward(
        fparams, toks, fcfg, input_pos=jnp.arange(T), kv_cache=cache_b,
        prefill_from_zero=True,
    )
    logits_p, new_p = forward(
        fparams, toks, fcfg, input_pos=jnp.arange(T), kv_cache=cache_p,
        prefill_from_zero=True,
    )
    np.testing.assert_array_equal(np.asarray(logits_p), np.asarray(logits_b))
    for lb, lp_ in zip(new_b, new_p):
        got = np.asarray(fused_layer.unpack_kv(lp_["k"]), np.float32)[:, :, :T]
        np.testing.assert_array_equal(got, np.asarray(lb["k"], np.float32)[:, :, :T])


def test_packed_cache_write_vector_rmw(prepared_bf16):
    """The XLA per-slot fallback write (kernel off) merges each slot's bf16
    row into the right half of its word-row without touching the neighbor."""
    rng = np.random.default_rng(3)
    B, H, S, hs = 3, 2, 8, 128
    base = jnp.asarray(rng.normal(size=(B, H, S, hs)), jnp.bfloat16)
    arr = fused_layer.pack_kv(base)
    new = jnp.asarray(rng.normal(size=(B, H, 1, hs)), jnp.bfloat16)
    pos = jnp.asarray([0, 3, 6], jnp.int32)
    got = llama._cache_write(arr, new, pos)
    ref = base.at[jnp.arange(B), :, pos].set(new[:, :, 0])
    np.testing.assert_array_equal(
        np.asarray(fused_layer.unpack_kv(got), np.float32),
        np.asarray(ref, np.float32),
    )


def test_use_serve_fused_batch_threshold(prepared_bf16, monkeypatch):
    """Batched-kernel dispatch: the round-4 pipelined kernels win at every
    measured slot count, so the default cap is above any practical batch
    (32 slots MUST dispatch fused — the 837-vs-685 tok/s config); the cap
    stays env-overridable for re-measurement on new toolchains."""
    _, _, fparams, fcfg = prepared_bf16
    lp = fparams["h"][0]
    monkeypatch.setattr(
        "jax._src.xla_bridge.default_backend", lambda *a, **k: "tpu",
        raising=False,
    )
    monkeypatch.setattr(fused_layer.jax, "default_backend", lambda: "tpu")
    assert fused_layer.use_serve_fused(fcfg, lp, batch=8)
    assert fused_layer.use_serve_fused(fcfg, lp, batch=32)
    assert fused_layer.use_serve_fused(fcfg, lp, batch=fused_layer.SERVE_KERNEL_MAX_B)
    assert not fused_layer.use_serve_fused(
        fcfg, lp, batch=fused_layer.SERVE_KERNEL_MAX_B + 1
    )
    monkeypatch.setenv("LIT_LLAMA_TPU_SERVE_KERNEL_MAX_B", "16")
    assert not fused_layer.use_serve_fused(fcfg, lp, batch=32)
    # batch unknown (single-stream / direct kernel callers): unaffected
    monkeypatch.delenv("LIT_LLAMA_TPU_SERVE_KERNEL_MAX_B")
    assert fused_layer.use_serve_fused(fcfg, lp)


# ---------------------------------------------------------------------------
# LoRA on the fused decode paths (BASELINE config #4): the low-rank update is
# folded into two dense kernel operands (prepare_lora_operands) and chained as
# two small dots inside the whole-layer and block-head kernels.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def prepared_lora():
    from lit_llama_tpu.models.config import LoRAConfig

    cfg = tiny_config().replace(lora=LoRAConfig(r=4, alpha=8.0, dropout=0.0))
    dense = init_params(cfg.replace(quantize=None), jax.random.PRNGKey(0))
    dense["h"]["attn"]["c_attn"]["lora_b"] = (
        jax.random.normal(
            jax.random.PRNGKey(9), dense["h"]["attn"]["c_attn"]["lora_b"].shape
        )
        * 0.1
    )
    qparams = llama.unstack_layers(llama.quantize_params(dense, cfg))
    assert fused_layer.fused_layer_supported(cfg, qparams)
    fparams, fcfg = fused_layer.prepare_fused_params(qparams, cfg)
    assert "lora_af" in fparams["h"][0]["attn"]["c_attn"]
    return cfg, qparams, fparams, fcfg


def test_lora_half_basis_forward_equivalence(prepared_lora):
    """prepare_lora_operands permutes lora_b's q columns with the weights: the
    half-basis XLA forward (prefill/parity path) equals the interleaved one."""
    cfg, qparams, fparams, fcfg = prepared_lora
    toks = jnp.asarray([[3, 17, 42, 99, 7]], jnp.int32)
    ref, _ = forward(qparams, toks, cfg)
    got, _ = forward(fparams, toks, fcfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("pos", [0, 37])
def test_decode_layer_fused_lora_matches_xla(prepared_lora, pos):
    cfg, _, fparams, fcfg = prepared_lora
    D, H, hs = cfg.n_embd, cfg.n_head, cfg.head_size
    S = 128
    rng = np.random.default_rng(pos + 11)
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
        np.asarray(got_out), np.asarray(ref_out), rtol=2e-3, atol=2e-3
    )
    # the update is live inside the kernel: dropping the operands changes out
    lp_nolora = jax.tree_util.tree_map(lambda a: a, lp)
    lp_nolora["attn"]["c_attn"] = {
        k: v
        for k, v in lp["attn"]["c_attn"].items()
        if not k.startswith("lora")
    }
    with pltpu.force_tpu_interpret_mode():
        base_out, _ = fused_layer.decode_layer_fused(
            x, lp_nolora, kv, cosf, sinf, pos_arr % S, pos_arr, fcfg
        )
    assert np.abs(np.asarray(got_out) - np.asarray(base_out)).max() > 1e-5


def test_fused_generate_lora_matches_standard(prepared_lora):
    """End-to-end greedy decode through the fused kernels with the LoRA
    side-branch equals the per-op XLA decode on the same overlaid weights."""
    from lit_llama_tpu.models import generate as gen

    cfg, qparams, fparams, fcfg = prepared_lora
    prompt = np.asarray([5, 23, 81, 2, 40], np.int32)
    ref = gen.generate(
        qparams, prompt, 8, config=cfg, max_seq_length=32, temperature=0.0
    )
    with pltpu.force_tpu_interpret_mode():
        got = gen.generate(
            fparams, prompt, 8, config=fcfg, max_seq_length=32, temperature=0.0
        )
    assert got.tolist() == ref.tolist()


def test_engine_batched_fused_lora_matches(prepared_lora, monkeypatch):
    """Continuous-batching decode through block_head (with the LoRA dots) +
    write-attention + block_tail matches the per-op XLA engine greedy."""
    from lit_llama_tpu.models.generate import generate
    from lit_llama_tpu.ops import fused_layer as fl
    from lit_llama_tpu.serve.engine import DecodeEngine

    cfg, qparams, fparams, fcfg = prepared_lora
    monkeypatch.setattr(
        fl,
        "use_serve_fused",
        lambda config, lp, batch=None: config.rope_layout == "half"
        and "qzero" in lp["attn"]["c_attn"]
        and "c_fc12" in lp["mlp"],
    )
    rng = np.random.default_rng(23)
    prompts = [rng.integers(1, 128, size=n).astype(np.int32) for n in (5, 9)]
    expected = [
        generate(
            qparams, p, 6, config=cfg, max_seq_length=64, temperature=0.0
        )[len(p):].tolist()
        for p in prompts
    ]
    with pltpu.force_tpu_interpret_mode():
        eng = DecodeEngine(fparams, fcfg, max_batch=2, max_seq_length=64)
        ids = [eng.submit(p, 6) for p in prompts]
        done = eng.run()
    for rid, exp in zip(ids, expected):
        assert done[rid].generated == exp, rid


# ---------------------------------------------------------------------------
# Multi-layer launches: n blocks per pallas_call with the DMA chain crossing
# the in-launch layer boundary (the megakernel was deleted in round 5 — one
# launch per STEP measured slower than per-layer launches on chip).
# ---------------------------------------------------------------------------


def test_decode_layers_fused_matches_chain(prepared):
    """2 blocks per launch == chaining two single-layer launches."""
    cfg, _, fparams, fcfg = prepared
    D, H, hs = fcfg.n_embd, fcfg.n_head, fcfg.head_size
    S = 32
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, D)) * 0.4, jnp.float32)
    kvs = [
        {
            "k": jnp.asarray(rng.normal(size=(1, H, S, hs)) * 0.2, jnp.float32),
            "v": jnp.asarray(rng.normal(size=(1, H, S, hs)) * 0.2, jnp.float32),
        }
        for _ in range(2)
    ]
    rope_cache = build_rope_cache(fcfg.block_size, hs)
    pos = jnp.int32(7)
    cosf, sinf = rope_half_row(rope_cache, pos, hs)
    f32cfg = fcfg.replace(compute_dtype="float32")

    x2, kvs2 = fused_layer.decode_layers_fused(
        x, tuple(fparams["h"][:2]), tuple(kvs), cosf, sinf, pos % S, pos,
        f32cfg, interpret=True,
    )
    xr = x
    kvr = []
    for lp, kv in zip(fparams["h"][:2], kvs):
        xr, nk = fused_layer.decode_layer_fused(
            xr, lp, kv, cosf, sinf, pos % S, pos, f32cfg, interpret=True
        )
        kvr.append(nk)
    np.testing.assert_allclose(
        np.asarray(x2, np.float32), np.asarray(xr, np.float32),
        atol=1e-4, rtol=1e-4,
    )
    for a, b in zip(kvs2, kvr):
        np.testing.assert_array_equal(np.asarray(a["k"]), np.asarray(b["k"]))

# ---------------------------------------------------------------------------


def test_arith_unpack_matches_i32(prepared, monkeypatch):
    """LIT_LLAMA_TPU_UNPACK=arith (floor/multiply-subtract nibble decode) is
    bit-identical to the i32 shift/mask path in f32 compute."""
    monkeypatch.setenv("LIT_LLAMA_TPU_UNPACK", "arith")
    cfg, _, fparams, fcfg = prepared
    D, H, hs = cfg.n_embd, cfg.n_head, cfg.head_size
    S = 128
    rng = np.random.default_rng(77)
    kv = {
        "k": jnp.asarray(rng.normal(size=(1, H, S, hs)) * 0.3, jnp.float32),
        "v": jnp.asarray(rng.normal(size=(1, H, S, hs)) * 0.3, jnp.float32),
    }
    x = jnp.asarray(rng.normal(size=(1, D)) * 0.5, jnp.float32)
    lp = fparams["h"][0]
    pos = jnp.int32(11)
    rope_cache = build_rope_cache(fcfg.block_size, hs)
    cosf, sinf = rope_half_row(rope_cache, pos, hs)
    # fresh trace per env value: the flag is read at TRACE time, so clear the
    # jit cache of the wrapped call
    fused_layer._call_layers.clear_cache()
    with pltpu.force_tpu_interpret_mode():
        got_arith, _ = fused_layer.decode_layer_fused(
            x, lp, kv, cosf, sinf, pos % S, pos, fcfg
        )
    monkeypatch.setenv("LIT_LLAMA_TPU_UNPACK", "i32")
    fused_layer._call_layers.clear_cache()
    with pltpu.force_tpu_interpret_mode():
        got_i32, _ = fused_layer.decode_layer_fused(
            x, lp, kv, cosf, sinf, pos % S, pos, fcfg
        )
    fused_layer._call_layers.clear_cache()
    np.testing.assert_array_equal(np.asarray(got_arith), np.asarray(got_i32))
