"""Per-step collective anatomy of the tensor-parallel decode step.

Compiles the shard_map TP decode step at a real 13B layer geometry
(n_embd 5120, 40 heads, int4 weights — BASELINE config #5) over a virtual
device mesh and walks the compiled HLO for collectives: op kind, tensor
shape, bytes moved per step, and where each sits relative to the
dequant-matmul kernels it could overlap with.

This is the honest single-host stand-in for the unmeasurable multi-host
scaling target: the collective BYTES are layout facts that transfer to real
ICI, only the achieved bandwidth does not.

Usage: python scripts/comm_anatomy.py [--mp 2] [--n_layer 2] [--batch 8]
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

_DTYPE_BYTES = {
    "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
    "pred": 1, "s16": 2, "u16": 2, "f64": 8,
}

_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)


def _shape_bytes(shape_str: str) -> int:
    """'bf16[1,15360]{1,0}' -> byte count (0 for tuple/opaque shapes)."""
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    if dt not in _DTYPE_BYTES:
        return 0
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dt]


def census(hlo_text: str):
    """Collective ops in a compiled HLO module: [(kind, shape, bytes)]."""
    rows = []
    for line in hlo_text.splitlines():
        line = line.strip()
        m = re.match(r"%?[\w.-]+ = ([\w\[\]{},\d ]+?) (all-reduce|all-gather|"
                     r"reduce-scatter|collective-permute|all-to-all)", line)
        if not m:
            continue
        shape, kind = m.group(1).strip(), m.group(2)
        # tuple shapes: sum the elements
        nbytes = sum(_shape_bytes(s) for s in re.findall(r"\w+\[[\d,]*\]", shape))
        rows.append((kind, shape, nbytes))
    return rows


def _print_census(rows, header: str):
    per_kind: dict = {}
    for kind, shape, nbytes in rows:
        c, b = per_kind.get(kind, (0, 0))
        per_kind[kind] = (c + 1, b + nbytes)
    total = sum(b for _, b in per_kind.values())
    print(header)
    print(f"{'collective':20} {'count':>6} {'bytes/step':>12}")
    for kind, (c, b) in sorted(per_kind.items()):
        print(f"{kind:20} {c:>6} {b:>12,}")
    print(f"{'TOTAL':20} {sum(c for c, _ in per_kind.values()):>6} {total:>12,}")
    return total


def _abstract(tree, mesh, spec_tree):
    """ShapeDtypeStruct tree carrying the real NamedShardings — lets us
    compile-and-census full-depth geometries (40-layer 13B = 6.5 GB int4,
    26 GB bf16 dense) without materializing a byte."""
    import jax
    from jax.sharding import NamedSharding

    return jax.tree_util.tree_map(
        lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                          sharding=NamedSharding(mesh, s)),
        tree, spec_tree,
    )


def decode_census(config, mp: int, batch: int, cache_len: int = 256):
    """Compile the shard_map TP decode step (abstract operands) and return
    (census rows, per-device int4 weight-stream bytes)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import bench as benchmod
    from lit_llama_tpu import llama
    from lit_llama_tpu.parallel import mesh as mesh_lib, tp as tp_lib

    devices = jax.devices("cpu")
    mesh = mesh_lib.make_mesh(data=1, model=mp, devices=devices[:mp])

    def prep(key):
        p = benchmod.random_int4_params(config, key)
        p = llama.unstack_layers(p)
        return tp_lib.prepare_tp_params(p, config, mp)

    params_abs = jax.eval_shape(prep, jax.random.PRNGKey(0))
    params = _abstract(params_abs, mesh, tp_lib.tp_param_specs(params_abs))
    cache_abs = jax.eval_shape(
        lambda: llama.init_kv_cache(config, batch, cache_len)
    )
    cache = _abstract(
        cache_abs, mesh,
        jax.tree_util.tree_map(lambda _: tp_lib.cache_spec(False), cache_abs),
    )
    _, decode_fn = tp_lib.make_sharded_forwards(config, mesh, params)

    rep = NamedSharding(mesh, P())
    tok = jax.ShapeDtypeStruct((batch, 1), jnp.int32, sharding=rep)
    pos = jax.ShapeDtypeStruct((batch,), jnp.int32, sharding=rep)
    hlo = jax.jit(decode_fn).lower(params, tok, pos, cache).compile().as_text()

    D, I, V = config.n_embd, config.intermediate_size, config.padded_vocab_size
    L = config.n_layer
    wbytes = (D * 3 * D // 2 + D * D // 2 + 2 * D * I // 2 + I * D // 2) * L
    wbytes = wbytes // mp + D * V // 2 // mp
    return census(hlo), wbytes


def train_census(config, dp: int, micro_batch: int, accum: int, fsdp: bool):
    """Compile the full training step (grad accumulation scan + AdamW) over a
    dp-way data mesh with abstract operands and return its collective census
    — the grad all-reduce / FSDP all-gather+reduce-scatter bytes per step."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lit_llama_tpu import llama
    from lit_llama_tpu.parallel import mesh as mesh_lib, sharding
    from lit_llama_tpu.training import step as step_lib

    devices = jax.devices("cpu")
    mesh = mesh_lib.make_mesh(data=dp, model=1, devices=devices[:dp])
    tc = step_lib.TrainConfig(warmup_iters=2, max_iters=100)
    optimizer = step_lib.make_optimizer(tc)

    def init_state(key):
        # UNROLLED layers: per-layer collectives inside a lax.scan body would
        # appear once in the HLO text but execute n_layer times — the census
        # must see every instance (real training uses the stacked scan; the
        # collective set per layer is identical)
        p = llama.unstack_layers(llama.init_params(config, key), fuse_mlp=False)
        return step_lib.TrainState(p, optimizer.init(p), jnp.int32(0))

    state_abs = jax.eval_shape(init_state, jax.random.PRNGKey(0))
    # param_pspecs keys off the trailing path names, so it shards the Adam
    # moments (same nested names) identically to their parameters
    specs = sharding.param_pspecs(state_abs, fsdp=fsdp, tp=False)
    state = _abstract(state_abs, mesh, specs)

    bsh = NamedSharding(mesh, P(None, mesh_lib.DATA_AXIS, None))
    ids = jax.ShapeDtypeStruct(
        (accum, micro_batch * dp, config.block_size), jnp.int32, sharding=bsh
    )
    with mesh:
        hlo = (
            step_lib.train_step.lower(
                state, ids, ids, config, optimizer, remat_policy="dots"
            )
            .compile()
            .as_text()
        )
    n_params = sum(
        int(np_prod(l.shape)) for l in jax.tree_util.tree_leaves(state_abs.params)
    )
    return census(hlo), n_params


def np_prod(shape):
    n = 1
    for d in shape:
        n *= int(d)
    return n


def main(mode: str = "decode", mp: int = 2, dp: int = 8, n_layer: int = 40,
         batch: int = 8, n_embd: int = 5120, n_head: int = 40,
         vocab_size: int = 32000, micro_batch: int = 1, accum: int = 1,
         fsdp: bool = True, block_size: int = 2048) -> None:
    """Collective census of the TP decode step or the training step at a real
    13B geometry, full depth (operands are abstract — nothing materializes).

    Args:
        mode: "decode" (shard_map TP decode) or "train" (dp/FSDP train step).
        mp: Model-parallel degree (decode mode).
        dp: Data-parallel degree (train mode).
        n_layer: Layers (default: the full 40-layer 13B depth).
        batch: Decode slots (decode mode).
        n_embd: Width (13B: 5120).
        n_head: Heads (13B: 40).
        vocab_size: Vocabulary (13B: 32000).
        micro_batch: Per-device microbatch rows (train mode).
        accum: Gradient-accumulation microsteps (train mode).
        fsdp: Shard params+moments over data (ZeRO-3); False = pure DP.
        block_size: Sequence length (train mode compiles at this T).
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={max(8, mp, dp)}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from lit_llama_tpu import LLaMAConfig

    if mode == "decode":
        config = LLaMAConfig(
            block_size=2048, vocab_size=vocab_size, n_layer=n_layer,
            n_head=n_head, n_embd=n_embd, quantize="int4", quant_groupsize=128,
            param_dtype="bfloat16", compute_dtype="bfloat16",
        )
        rows, wbytes = decode_census(config, mp, batch)
        total = _print_census(
            rows,
            f"# TP decode step, {n_embd=} {n_head=} {n_layer=} mp={mp} B={batch}",
        )
        print(
            f"# per-device int4 weight stream: {wbytes:,} bytes/step -> "
            f"collectives are {100 * total / max(1, wbytes):.2f}% of the weight "
            f"traffic a psum can hide behind"
        )
        for kind, shape, nbytes in rows:
            print(f"  {kind:20} {nbytes:>10,}  {shape[:90]}")
    elif mode == "train":
        config = LLaMAConfig(
            block_size=block_size, vocab_size=vocab_size, n_layer=n_layer,
            n_head=n_head, n_embd=n_embd,
            param_dtype="bfloat16", compute_dtype="bfloat16",
        )
        rows, n_params = train_census(config, dp, micro_batch, accum, fsdp)
        total = _print_census(
            rows,
            f"# train step, {n_embd=} {n_head=} {n_layer=} dp={dp} "
            f"micro_batch={micro_batch} accum={accum} fsdp={fsdp}",
        )
        # per-step model FLOPs per device, for the overlap budget: 6·N·T
        # forward+backward (+remat recompute excluded — it adds compute, not
        # comm), vs the collective bytes above riding ICI
        tokens_dev = micro_batch * accum * config.block_size
        flops_dev = 6 * n_params * tokens_dev
        print(
            f"# params {n_params / 1e9:.2f}B; per-device step compute "
            f"~{flops_dev / 1e12:.1f} TFLOP ({tokens_dev} tokens) vs "
            f"{total / 2**30:.3f} GiB of collectives/step"
        )
        for kind, shape, nbytes in sorted(rows, key=lambda r: -r[2])[:12]:
            print(f"  {kind:20} {nbytes:>12,}  {shape[:90]}")
    else:
        raise ValueError(f"unknown mode {mode!r} (decode|train)")


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(main)
