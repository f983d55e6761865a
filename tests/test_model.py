"""Golden parity tests for the core model.

The reference proves correctness by numerical equivalence with Meta's original
implementation (reference: tests/test_model.py:37-102). We use HuggingFace's
LlamaForCausalLM (torch CPU) as the golden model instead — it is itself
logits-equivalent to Meta's code, and going through it also exercises our HF
weight conversion (rotary un-permute + QKV fusion) end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lit_llama_tpu import LLaMAConfig, build_rope_cache, forward, init_kv_cache, init_params
from lit_llama_tpu.utils import convert


def make_hf_model(config: LLaMAConfig, seed: int = 0):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_config = LlamaConfig(
        vocab_size=config.padded_vocab_size,
        hidden_size=config.n_embd,
        intermediate_size=config.intermediate_size,
        num_hidden_layers=config.n_layer,
        num_attention_heads=config.n_head,
        num_key_value_heads=config.n_head,
        max_position_embeddings=config.block_size,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attention_bias=False,
        mlp_bias=False,
    )
    torch.manual_seed(seed)
    model = LlamaForCausalLM(hf_config)
    model.eval()
    return model


def hf_params_for(config, hf_model):
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    lit_sd = convert.hf_to_lit(sd, config)
    return convert.lit_to_pytree(lit_sd, config)


@pytest.fixture(scope="module")
def parity_setup():
    config = LLaMAConfig(block_size=64, vocab_size=128, n_layer=2, n_head=4, n_embd=64)
    hf_model = make_hf_model(config)
    params = hf_params_for(config, hf_model)
    return config, hf_model, params


def test_forward_parity_with_hf(parity_setup):
    torch = pytest.importorskip("torch")
    config, hf_model, params = parity_setup
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, config.vocab_size, size=(2, 17), dtype=np.int64)

    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(tokens)).logits.numpy()

    ours, _ = forward(params, jnp.asarray(tokens, jnp.int32), config)
    np.testing.assert_allclose(np.asarray(ours), hf_logits, atol=2e-4, rtol=2e-3)


def test_kv_cache_decode_matches_full_forward(parity_setup):
    """Incremental decode with the KV cache reproduces the full forward
    (reference: tests/test_model.py with/without cache)."""
    config, _, params = parity_setup
    rng = np.random.default_rng(1)
    T = 12
    tokens = jnp.asarray(rng.integers(0, config.vocab_size, size=(1, T)), jnp.int32)
    rope_cache = build_rope_cache(config.block_size, config.head_size)

    full_logits, _ = forward(params, tokens, config, rope_cache=rope_cache)

    max_seq = 32
    cache = init_kv_cache(config, 1, max_seq, dtype=jnp.float32)
    # Prefill first 5 tokens, then decode one at a time.
    prefill = 5
    logits, cache = forward(
        params,
        tokens[:, :prefill],
        config,
        rope_cache=rope_cache,
        input_pos=jnp.arange(prefill),
        kv_cache=cache,
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full_logits[:, :prefill]), atol=1e-5, rtol=1e-5
    )
    for t in range(prefill, T):
        logits, cache = forward(
            params,
            tokens[:, t : t + 1],
            config,
            rope_cache=rope_cache,
            input_pos=jnp.asarray([t]),
            kv_cache=cache,
        )
        np.testing.assert_allclose(
            np.asarray(logits[:, 0]),
            np.asarray(full_logits[:, t]),
            atol=1e-5,
            rtol=1e-5,
            err_msg=f"mismatch at decode step {t}",
        )


def test_kv_cache_rolling_overflow(parity_setup):
    """When input_pos exceeds the cache, the cache rolls left one slot and the new
    entry is written at the last slot (reference: lit_llama/model.py:211-221)."""
    config, _, params = parity_setup
    rng = np.random.default_rng(2)
    max_seq = 8
    T_total = 11
    tokens = jnp.asarray(rng.integers(0, config.vocab_size, size=(1, T_total)), jnp.int32)
    rope_cache = build_rope_cache(config.block_size, config.head_size)

    cache = init_kv_cache(config, 1, max_seq, dtype=jnp.float32)
    logits, cache = forward(
        params,
        tokens[:, :max_seq],
        config,
        rope_cache=rope_cache,
        input_pos=jnp.arange(max_seq),
        kv_cache=cache,
    )
    k_before = np.asarray(cache["k"])
    for t in range(max_seq, T_total):
        logits, cache = forward(
            params,
            tokens[:, t : t + 1],
            config,
            rope_cache=rope_cache,
            input_pos=jnp.asarray([t]),
            kv_cache=cache,
        )
    k_after = np.asarray(cache["k"])
    shift = T_total - max_seq
    # Entries that were at slots [shift:] moved to [:-shift].
    np.testing.assert_allclose(
        k_after[:, :, :, : max_seq - shift], k_before[:, :, :, shift:], atol=1e-6
    )
    assert np.isfinite(np.asarray(logits)).all()


def test_forward_jits_and_batches(parity_setup):
    config, _, params = parity_setup
    fwd = jax.jit(lambda p, t: forward(p, t, config)[0])
    tokens = jnp.zeros((3, 8), jnp.int32)
    out = fwd(params, tokens)
    assert out.shape == (3, 8, config.padded_vocab_size)


def test_init_params_shapes_and_std():
    config = LLaMAConfig(block_size=32, vocab_size=96, n_layer=3, n_head=2, n_embd=32)
    params = init_params(config, jax.random.PRNGKey(0))
    assert params["wte"].shape == (128, 32)  # padded to multiple of 64
    assert params["h"]["attn"]["c_attn"]["w"].shape == (3, 32, 96)
    assert params["h"]["mlp"]["c_fc1"]["w"].shape == (3, 32, config.intermediate_size)
    assert params["lm_head"]["w"].shape == (32, 128)
    # init std = 0.02/sqrt(2*n_layer) (reference: lit_llama/model.py:70-74)
    std = np.std(np.asarray(params["h"]["attn"]["c_attn"]["w"]))
    assert abs(std - 0.02 / np.sqrt(6)) < 2e-3


def test_unstacked_layers_match_stacked(tiny_config):
    """Inference layout (unrolled per-layer params) computes identically to the
    stacked/scan layout, with and without kv cache."""
    import jax
    import jax.numpy as jnp

    from lit_llama_tpu.models import llama

    params = init_params(tiny_config, jax.random.PRNGKey(3))
    tokens = jnp.arange(10, dtype=jnp.int32).reshape(1, 10) % 128
    ref, _ = forward(params, tokens, tiny_config)
    up = llama.unstack_layers(params)
    got, _ = forward(up, tokens, tiny_config)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    cache_s = init_kv_cache(tiny_config, 1, 10)
    ref_d, cache_s = forward(
        params, tokens[:, :4], tiny_config, input_pos=jnp.arange(4), kv_cache=cache_s
    )
    cache_u = init_kv_cache(tiny_config, 1, 10)
    got_d, cache_u = forward(
        up, tokens[:, :4], tiny_config, input_pos=jnp.arange(4), kv_cache=cache_u
    )
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(cache_u["k"]), np.asarray(cache_s["k"]), atol=1e-6
    )
    # round-trip
    rs = llama.stack_layers(up)
    np.testing.assert_allclose(
        np.asarray(rs["h"]["attn"]["c_attn"]["w"]),
        np.asarray(params["h"]["attn"]["c_attn"]["w"]),
    )


def test_per_layer_kv_cache_matches_stacked(tiny_config):
    """The per-layer (tuple) cache layout used with unstacked weights decodes
    identically to the stacked (L, ...) layout — including the roll-left
    overflow path (axis=-2 roll must hit the sequence dim in both layouts)."""
    import jax
    import jax.numpy as jnp

    from lit_llama_tpu.models import llama

    params = init_params(tiny_config, jax.random.PRNGKey(3))
    up = llama.unstack_layers(params)
    tokens = jnp.arange(10, dtype=jnp.int32).reshape(1, 10) % 128
    S = 6

    cache_s = init_kv_cache(tiny_config, 1, S)
    cache_u = llama.unstack_kv_cache(init_kv_cache(tiny_config, 1, S))
    assert isinstance(cache_u, tuple) and len(cache_u) == tiny_config.n_layer

    ref, cache_s = forward(
        params, tokens[:, :4], tiny_config, input_pos=jnp.arange(4), kv_cache=cache_s
    )
    got, cache_u = forward(
        up, tokens[:, :4], tiny_config, input_pos=jnp.arange(4), kv_cache=cache_u
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
    # decode past the cache end to exercise the overflow roll in both layouts
    for pos in range(4, 8):
        ref, cache_s = forward(
            params, tokens[:, pos : pos + 1], tiny_config,
            input_pos=jnp.array([pos]), kv_cache=cache_s,
        )
        got, cache_u = forward(
            up, tokens[:, pos : pos + 1], tiny_config,
            input_pos=jnp.array([pos]), kv_cache=cache_u,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(llama.stack_kv_cache(cache_u)["k"]),
        np.asarray(cache_s["k"]),
        atol=1e-6,
    )


def test_int8_kv_cache_decode_close_to_bf16(tiny_config):
    """int8 KV cache decode tracks the full-precision cache closely (beyond the
    reference; PAPERS.md KV-cache quantization direction)."""
    import jax
    import jax.numpy as jnp

    from lit_llama_tpu.models import llama

    params = init_params(tiny_config, jax.random.PRNGKey(5))
    qcfg = tiny_config.replace(kv_cache_dtype="int8")
    toks = (jnp.arange(12, dtype=jnp.int32) * 7 % 128)[None, :]

    cache_f = init_kv_cache(tiny_config, 1, 12)
    ref, cache_f = forward(
        params, toks[:, :8], tiny_config, input_pos=jnp.arange(8), kv_cache=cache_f
    )
    cache_q = init_kv_cache(qcfg, 1, 12)
    assert cache_q["k"].dtype == jnp.int8 and "ks" in cache_q
    got, cache_q = forward(
        params, toks[:, :8], qcfg, input_pos=jnp.arange(8), kv_cache=cache_q
    )
    # prefill logits: last position only depends on cache written this call
    np.testing.assert_allclose(
        np.asarray(got[:, -1]), np.asarray(ref[:, -1]), atol=0.05, rtol=0.05
    )
    # a decode step reading the quantized cache
    ref_d, _ = forward(
        params, toks[:, 8:9], tiny_config, input_pos=jnp.array([8]), kv_cache=cache_f
    )
    got_d, _ = forward(
        params, toks[:, 8:9], qcfg, input_pos=jnp.array([8]), kv_cache=cache_q
    )
    err = np.abs(np.asarray(got_d) - np.asarray(ref_d)).max()
    mag = np.abs(np.asarray(ref_d)).max()
    assert err < 0.05 * mag + 0.05, (err, mag)


def test_int8_kv_cache_engine_runs(tiny_config):
    """Continuous batching over an int8 cache produces sane tokens."""
    import jax

    from lit_llama_tpu.serve.engine import DecodeEngine

    qcfg = tiny_config.replace(kv_cache_dtype="int8")
    params = init_params(qcfg, jax.random.PRNGKey(5))
    eng = DecodeEngine(params, qcfg, max_batch=2, steps_per_sync=2)
    rid = eng.submit(np.asarray([3, 5, 7], np.int32), 6)
    done = eng.run()
    assert len(done[rid].generated) == 6
    assert all(0 <= t < qcfg.padded_vocab_size for t in done[rid].generated)


def test_prefill_from_zero_matches_general_path(tiny_config):
    """The flash-eligible prefill fast path equals the general masked path."""
    import jax
    import jax.numpy as jnp

    params = init_params(tiny_config, jax.random.PRNGKey(6))
    toks = (jnp.arange(8, dtype=jnp.int32) * 5 % 128)[None, :]
    cache_a = init_kv_cache(tiny_config, 1, 16)
    ref, cache_a = forward(
        params, toks, tiny_config, input_pos=jnp.arange(8), kv_cache=cache_a
    )
    cache_b = init_kv_cache(tiny_config, 1, 16)
    got, cache_b = forward(
        params,
        toks,
        tiny_config,
        input_pos=jnp.arange(8),
        kv_cache=cache_b,
        prefill_from_zero=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(cache_b["k"]), np.asarray(cache_a["k"]), atol=1e-6
    )
