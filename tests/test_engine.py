"""Continuous-batching engine: parity with sequential generate, slot recycling,
interleaved admission (north-star scope — no reference counterpart)."""

import jax
import numpy as np
import pytest

from lit_llama_tpu import LLaMAConfig, init_params
from lit_llama_tpu.models.generate import generate
from lit_llama_tpu.serve.engine import DecodeEngine


@pytest.fixture(scope="module")
def setup():
    cfg = LLaMAConfig(block_size=64, vocab_size=97, n_layer=2, n_head=4, n_embd=64)
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def ref_greedy(params, cfg, prompt, n):
    y = generate(
        params, prompt, n, config=cfg, max_seq_length=cfg.block_size, temperature=0.0
    )
    return y[len(prompt) :].tolist()


def test_engine_matches_sequential_greedy(setup):
    cfg, params = setup
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 97, size=n).astype(np.int32) for n in (5, 11, 23)]
    n_new = 8

    eng = DecodeEngine(params, cfg, max_batch=4)
    ids = [eng.submit(p, n_new) for p in prompts]
    done = eng.run()
    assert set(done) == set(ids)
    for rid, p in zip(ids, prompts):
        expected = ref_greedy(params, cfg, p, n_new)
        assert done[rid].generated == expected, f"request {rid}"


def test_engine_more_requests_than_slots(setup):
    cfg, params = setup
    rng = np.random.default_rng(1)
    prompts = [rng.integers(1, 97, size=rng.integers(3, 20)).astype(np.int32) for _ in range(7)]
    eng = DecodeEngine(params, cfg, max_batch=2)
    ids = [eng.submit(p, 5) for p in prompts]
    done = eng.run()
    assert set(done) == set(ids)
    for rid, p in zip(ids, prompts):
        assert done[rid].generated == ref_greedy(params, cfg, p, 5)


def test_engine_interleaved_admission(setup):
    """Submitting mid-flight slots into a free slot without disturbing others."""
    cfg, params = setup
    rng = np.random.default_rng(2)
    p1 = rng.integers(1, 97, size=9).astype(np.int32)
    p2 = rng.integers(1, 97, size=13).astype(np.int32)
    eng = DecodeEngine(params, cfg, max_batch=2)
    i1 = eng.submit(p1, 10)
    for _ in range(3):
        eng.step_once()
    i2 = eng.submit(p2, 6)
    done = eng.run()
    assert done[i1].generated == ref_greedy(params, cfg, p1, 10)
    assert done[i2].generated == ref_greedy(params, cfg, p2, 6)


def test_engine_eos_and_ttft(setup):
    cfg, params = setup
    p = np.asarray([3, 4, 5], np.int32)
    expected = ref_greedy(params, cfg, p, 10)
    eos = expected[2]
    eng = DecodeEngine(params, cfg, max_batch=1)
    rid = eng.submit(p, 10, eos_id=eos)
    done = eng.run()
    assert done[rid].generated == expected[:3]  # stops at (and includes) eos
    assert done[rid].ttft is not None and done[rid].ttft >= 0


def test_engine_per_request_top_k(setup):
    """top_k is honored per request (advisor round-1: it was silently ignored).
    top_k=1 with temperature>0 must equal greedy; out-of-cap values reject."""
    cfg, params = setup
    rng = np.random.default_rng(4)
    p1 = rng.integers(1, 97, size=7).astype(np.int32)
    p2 = rng.integers(1, 97, size=7).astype(np.int32)
    eng = DecodeEngine(params, cfg, max_batch=2, top_k=50, seed=7)
    # slot A: top_k=1 sampling == greedy; slot B: default top_k, hot sampling
    i1 = eng.submit(p1, 8, temperature=1.0, top_k=1)
    i2 = eng.submit(p2, 8, temperature=5.0)
    done = eng.run()
    assert done[i1].generated == ref_greedy(params, cfg, p1, 8)
    assert len(done[i2].generated) == 8
    with pytest.raises(ValueError):
        eng.submit(p1, 4, top_k=51)  # above the engine cap
    eng_nofilter = DecodeEngine(params, cfg, max_batch=1, top_k=None)
    with pytest.raises(ValueError):
        eng_nofilter.submit(p1, 4, top_k=5)


def test_engine_tensor_parallel_matches_single_device(setup):
    """Continuous batching over a model-parallel mesh (shard_map TP) produces
    the same greedy tokens as the single-device engine."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from lit_llama_tpu.parallel import mesh as mesh_lib

    cfg, params = setup
    mesh = mesh_lib.make_mesh(data=1, model=2, devices=jax.devices()[:2])
    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, 97, size=n).astype(np.int32) for n in (5, 12)]

    eng = DecodeEngine(params, cfg, max_batch=2, mesh=mesh, steps_per_sync=2)
    ids = [eng.submit(p, 6) for p in prompts]
    done = eng.run()
    for rid, p in zip(ids, prompts):
        assert done[rid].generated == ref_greedy(params, cfg, p, 6), rid


def test_engine_data_parallel_matches_single_device(setup):
    """Slots sharded over the mesh data axis (weights replicated per group)
    produce the same greedy tokens as the unsharded engine (VERDICT r2 next
    #6: data-parallel serving)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from lit_llama_tpu.parallel import mesh as mesh_lib

    cfg, params = setup
    mesh = mesh_lib.make_mesh(data=4, model=1, devices=jax.devices()[:4])
    rng = np.random.default_rng(5)
    prompts = [rng.integers(1, 97, size=n).astype(np.int32) for n in (5, 12, 3, 17, 9)]

    eng = DecodeEngine(params, cfg, max_batch=4, mesh=mesh, steps_per_sync=2)
    ids = [eng.submit(p, 6) for p in prompts]
    done = eng.run()
    assert set(done) == set(ids)
    for rid, p in zip(ids, prompts):
        assert done[rid].generated == ref_greedy(params, cfg, p, 6), rid

    with pytest.raises(ValueError):
        DecodeEngine(params, cfg, max_batch=3, mesh=mesh)  # 3 % dp(4) != 0


def test_engine_dp_times_tp_matches_single_device(setup):
    """Composed dp=4 x mp=2 mesh: slots shard over data, heads over model
    (shard_map TP with a data-sharded decode batch)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from lit_llama_tpu.parallel import mesh as mesh_lib

    cfg, params = setup
    mesh = mesh_lib.make_mesh(data=4, model=2, devices=jax.devices()[:8])
    rng = np.random.default_rng(6)
    prompts = [rng.integers(1, 97, size=n).astype(np.int32) for n in (7, 4, 13, 10)]

    eng = DecodeEngine(params, cfg, max_batch=4, mesh=mesh, steps_per_sync=2)
    ids = [eng.submit(p, 6) for p in prompts]
    done = eng.run()
    assert set(done) == set(ids)
    for rid, p in zip(ids, prompts):
        assert done[rid].generated == ref_greedy(params, cfg, p, 6), rid


def test_engine_fused_write_attention_kernel_matches(setup):
    """The serving decode step routed through the fused cache-write +
    attention kernel (interpret mode; on TPU it dispatches automatically)
    produces the same greedy tokens as the XLA scatter + einsum path."""
    from jax.experimental.pallas import tpu as pltpu

    from lit_llama_tpu.ops import decode_attention as da

    cfg = LLaMAConfig(block_size=64, vocab_size=97, n_layer=2, n_head=2, n_embd=256)
    params = init_params(cfg, jax.random.PRNGKey(3))
    rng = np.random.default_rng(11)
    prompts = [rng.integers(1, 97, size=n).astype(np.int32) for n in (5, 11, 3)]

    expected = [ref_greedy(params, cfg, p, 6) for p in prompts]

    orig = da.use_write_attention
    da.use_write_attention = lambda q, kc, S: True
    try:
        with pltpu.force_tpu_interpret_mode():
            eng = DecodeEngine(params, cfg, max_batch=2)
            ids = [eng.submit(p, 6) for p in prompts]
            done = eng.run()
    finally:
        da.use_write_attention = orig
    for rid, exp in zip(ids, expected):
        assert done[rid].generated == exp, rid


def test_engine_generates_past_cache_length(setup):
    """A request may generate beyond max_seq_length: the slot's cache wraps as
    a ring buffer retaining the same sliding window as the single-stream
    roll-left path, so greedy outputs match generate() with the same
    max_seq_length (VERDICT r2 next #7: long-generation support)."""
    cfg, params = setup
    rng = np.random.default_rng(9)
    S = 16
    prompt = rng.integers(1, 97, size=5).astype(np.int32)
    n_new = 2 * S  # generates to position 5 + 32 = 37 >> S-1
    expected = generate(
        params, prompt, n_new, config=cfg, max_seq_length=S, temperature=0.0
    )[len(prompt) :].tolist()

    eng = DecodeEngine(params, cfg, max_batch=2, max_seq_length=S)
    # a second, short request shares the batch to prove slot independence
    other = rng.integers(1, 97, size=3).astype(np.int32)
    i1 = eng.submit(prompt, n_new)
    i2 = eng.submit(other, 4)
    done = eng.run()
    assert done[i1].generated == expected
    assert done[i2].generated == ref_greedy(params, cfg, other, 4)


def test_engine_chunked_prefill_matches_greedy(setup):
    """Prompts longer than prefill_chunk prefill across multiple step_once
    calls under a token budget; greedy outputs must equal the unchunked
    sequential reference (VERDICT r1 weak #3: admission control)."""
    cfg, params = setup
    rng = np.random.default_rng(7)
    # one long prompt (> 2 chunks), one exactly chunk-sized, several short —
    # the long one must not change anyone's output, only their scheduling
    prompts = [
        rng.integers(1, 97, size=n).astype(np.int32) for n in (41, 16, 5, 30, 9)
    ]
    n_new = 6
    eng = DecodeEngine(
        params, cfg, max_batch=2, prefill_chunk=16, prefill_budget=16
    )
    ids = [eng.submit(p, n_new) for p in prompts]
    done = eng.run()
    assert set(done) == set(ids)
    for rid, p in zip(ids, prompts):
        assert done[rid].generated == ref_greedy(params, cfg, p, n_new), f"req {rid}"


def test_engine_budget_interleaves_decode_with_prefill(setup):
    """While a long prompt is being chunk-prefilled, already-running requests
    keep producing tokens each step (no full-queue prefill stall)."""
    cfg, params = setup
    rng = np.random.default_rng(8)
    eng = DecodeEngine(params, cfg, max_batch=2, prefill_chunk=8, prefill_budget=8)
    short = eng.submit(rng.integers(1, 97, size=4).astype(np.int32), 40)
    eng.step_once()  # short admitted and decoding
    long_id = eng.submit(rng.integers(1, 97, size=40).astype(np.int32), 4)
    short_req = next(r for r in eng.slot_req if r is not None and r.id == short)
    produced = []
    for _ in range(4):  # long prompt needs ~5 chunks; decode must advance anyway
        eng.step_once()
        produced.append(len(short_req.generated))
    assert all(b > a for a, b in zip(produced, produced[1:])), produced
    done = eng.run()
    assert long_id in done and short in done
