"""Training-step and sharding tests. Distribution correctness runs on the
8-device virtual CPU mesh (replaces the reference's mocked-rank sharding tests,
SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from lit_llama_tpu import LLaMAConfig, init_params
from lit_llama_tpu.models.config import LoRAConfig
from lit_llama_tpu.parallel import mesh as mesh_lib
from lit_llama_tpu.parallel import sharding
from lit_llama_tpu.peft import lora as lora_mod
from lit_llama_tpu.training import step as step_lib


@pytest.fixture
def cfg():
    return LLaMAConfig(block_size=32, vocab_size=64, n_layer=2, n_head=4, n_embd=32)


def make_batch(key, A, B, T, vocab):
    ids = jax.random.randint(key, (A, B, T), 0, vocab, jnp.int32)
    return ids, ids


def test_loss_decreases(cfg):
    params = init_params(cfg, jax.random.PRNGKey(0))
    tc = step_lib.TrainConfig(learning_rate=1e-2, warmup_iters=0, max_iters=100)
    opt = step_lib.make_optimizer(tc)
    state = step_lib.init_train_state(params, opt)
    ids, tgt = make_batch(jax.random.PRNGKey(1), 1, 2, 16, 64)
    losses = []
    for _ in range(5):
        state, loss = step_lib.train_step(state, ids, tgt, cfg, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5


def test_grad_accumulation_equals_big_batch(cfg):
    """A microbatches of size B == one batch of A*B (the reference's
    no_backward_sync semantics, pretrain/redpajama.py:159-166)."""
    params = init_params(cfg, jax.random.PRNGKey(0))
    tc = step_lib.TrainConfig(learning_rate=1e-3, warmup_iters=0, max_iters=100)
    opt = step_lib.make_optimizer(tc)
    ids, tgt = make_batch(jax.random.PRNGKey(1), 4, 2, 16, 64)

    s1 = step_lib.init_train_state(params, opt)
    s1, loss_acc = step_lib.train_step(s1, ids, tgt, cfg, opt)

    big_ids = ids.reshape(1, 8, 16)
    s2 = step_lib.init_train_state(params, opt)
    s2, loss_big = step_lib.train_step(s2, big_ids, big_ids, cfg, opt)

    # same per-token mean loss and near-identical updates
    np.testing.assert_allclose(float(loss_acc), float(loss_big), rtol=1e-5)
    a = np.asarray(s1.params["h"]["attn"]["c_attn"]["w"])
    b = np.asarray(s2.params["h"]["attn"]["c_attn"]["w"])
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)


def test_masked_optimizer_freezes_base(cfg):
    lcfg = cfg.replace(lora=LoRAConfig(r=2, dropout=0.0))
    params = init_params(lcfg, jax.random.PRNGKey(0))
    mask = lora_mod.trainable_mask(params)
    tc = step_lib.TrainConfig(learning_rate=1e-2, warmup_iters=0, max_iters=100)
    opt = step_lib.make_optimizer(tc, trainable_mask=mask)
    state = step_lib.init_train_state(params, opt)
    ids, tgt = make_batch(jax.random.PRNGKey(1), 1, 2, 16, 64)
    state, _ = step_lib.train_step(state, ids, tgt, lcfg, opt)
    # base frozen (reference: mark_only_lora_as_trainable through an optimizer
    # step, tests/test_lora.py:24-66); lora_a moves
    np.testing.assert_array_equal(
        np.asarray(state.params["h"]["attn"]["c_attn"]["w"]),
        np.asarray(params["h"]["attn"]["c_attn"]["w"]),
    )
    assert (
        np.abs(
            np.asarray(state.params["h"]["attn"]["c_attn"]["lora_b"])
            - np.asarray(params["h"]["attn"]["c_attn"]["lora_b"])
        ).max()
        > 0
    )


def test_cross_entropy_ignore_index():
    logits = jnp.zeros((1, 4, 8))
    targets = jnp.array([[1, 2, -1, -1]])
    loss = step_lib.cross_entropy_loss(logits, targets)
    np.testing.assert_allclose(float(loss), np.log(8), rtol=1e-6)


def test_sharded_train_step_matches_single_device(cfg):
    """dp=4 x tp=2 sharded step computes the same loss as unsharded."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    params = init_params(cfg, jax.random.PRNGKey(0))
    tc = step_lib.TrainConfig(learning_rate=1e-3, warmup_iters=0, max_iters=100)
    opt = step_lib.make_optimizer(tc)
    ids, tgt = make_batch(jax.random.PRNGKey(1), 2, 4, 16, 64)

    s0 = step_lib.init_train_state(params, opt)
    _, loss_ref = step_lib.train_step(s0, ids, tgt, cfg, opt)

    mesh = mesh_lib.make_mesh(data=4, model=2)
    sp = sharding.shard_params(params, mesh, fsdp=True, tp=True)
    opt_state = jax.jit(opt.init)(sp)
    state = step_lib.TrainState(sp, opt_state, jnp.int32(0))
    bsh = NamedSharding(mesh, P(None, mesh_lib.DATA_AXIS, None))
    ids_s = jax.device_put(ids, bsh)
    tgt_s = jax.device_put(tgt, bsh)
    with mesh:
        state, loss_sharded = step_lib.train_step(state, ids_s, tgt_s, cfg, opt)
    np.testing.assert_allclose(float(loss_sharded), float(loss_ref), rtol=1e-5)


def test_param_pspecs_cover_tree(cfg):
    lcfg = cfg.replace(lora=LoRAConfig(r=2))
    params = init_params(lcfg, jax.random.PRNGKey(0))
    specs = sharding.param_pspecs(params, fsdp=True, tp=True)
    flat_p = jax.tree_util.tree_leaves(params)
    flat_s = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P)
    )
    assert len(flat_p) == len(flat_s)
    # specs never exceed leaf rank
    for p, s in zip(flat_p, flat_s):
        assert len(s) <= p.ndim


def test_cosine_lr_schedule():
    tc = step_lib.TrainConfig(
        learning_rate=1.0, min_lr=0.1, warmup_iters=10, max_iters=110
    )
    sched = step_lib.cosine_lr(tc)
    np.testing.assert_allclose(float(sched(0)), 0.0)
    np.testing.assert_allclose(float(sched(5)), 0.5)
    np.testing.assert_allclose(float(sched(10)), 1.0)
    np.testing.assert_allclose(float(sched(110)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(1000)), 0.1, rtol=1e-6)


def test_preemption_checkpoint(tmp_path, cfg):
    """SIGTERM-style stop: the loop saves a resumable checkpoint and exits
    (beyond the reference, which has no preemption handling — SURVEY.md §5)."""
    import os
    import signal
    import threading as th

    from lit_llama_tpu.training import loop as loop_lib

    params = init_params(cfg, jax.random.PRNGKey(0))
    tc = step_lib.TrainConfig(learning_rate=1e-3, warmup_iters=0, max_iters=100)
    opt = step_lib.make_optimizer(tc)
    state = step_lib.init_train_state(params, opt)

    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 2, 16), 0, 64, jnp.int32)

    sent = {"done": False}

    def batches():
        while True:
            if not sent["done"]:
                sent["done"] = True
            else:
                os.kill(os.getpid(), signal.SIGINT)  # request stop mid-training
            yield ids, ids

    lc = loop_lib.LoopConfig(
        out_dir=tmp_path, max_iters=50, log_interval=1000, eval_interval=0,
        save_interval=0,
    )
    state = loop_lib.train(state, batches(), cfg, opt, lc)
    ckpts = list(tmp_path.glob("preempt-*"))
    assert len(ckpts) == 1
    restored = loop_lib.load_train_checkpoint(ckpts[0], opt)
    assert int(restored.step) == int(state.step)
    np.testing.assert_array_equal(
        np.asarray(restored.params["h"]["attn"]["c_attn"]["w"]),
        np.asarray(state.params["h"]["attn"]["c_attn"]["w"]),
    )


def test_bf16_adam_state_tracks_fp32(cfg):
    """adam_state_dtype='bfloat16' halves optimizer-state memory; the training
    trajectory must track the fp32-state optimizer closely (the EMA math runs
    in fp32, only the carried moments round)."""
    params = init_params(cfg, jax.random.PRNGKey(0))
    ids, tgt = make_batch(jax.random.PRNGKey(1), 1, 2, 16, 64)

    def run(dtype):
        tc = step_lib.TrainConfig(
            learning_rate=1e-2, warmup_iters=0, max_iters=100,
            adam_state_dtype=dtype,
        )
        opt = step_lib.make_optimizer(tc)
        state = step_lib.init_train_state(params, opt)
        losses = []
        for _ in range(6):
            state, loss = step_lib.train_step(state, ids, tgt, cfg, opt)
            losses.append(float(loss))
        return losses, state

    ref_losses, _ = run(None)
    lp_losses, lp_state = run("bfloat16")
    # moments actually stored in bf16
    adam_states = [
        s
        for s in jax.tree_util.tree_leaves(
            lp_state.opt_state, is_leaf=lambda x: hasattr(x, "mu")
        )
        if hasattr(s, "mu")
    ]
    assert adam_states, "no ScaleByAdamState found"
    mu_leaf = jax.tree_util.tree_leaves(adam_states[0].mu)[0]
    assert mu_leaf.dtype == jnp.bfloat16
    assert lp_losses[-1] < lp_losses[0]
    np.testing.assert_allclose(lp_losses, ref_losses, rtol=0.02, atol=0.02)
