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


def main(mp: int = 2, n_layer: int = 2, batch: int = 8, n_embd: int = 5120,
         n_head: int = 40, vocab_size: int = 32000) -> None:
    """Compile the TP decode step at a 13B layer geometry and print its
    per-step collective census.

    Args:
        mp: Model-parallel degree (mesh model axis).
        n_layer: Layers (2 is enough — collectives scale linearly in L).
        batch: Decode slots.
        n_embd: Width (13B: 5120).
        n_head: Heads (13B: 40).
        vocab_size: Vocabulary (13B: 32000).
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={max(8, mp)}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import bench as benchmod
    from lit_llama_tpu import LLaMAConfig, llama
    from lit_llama_tpu.parallel import mesh as mesh_lib, tp as tp_lib

    config = LLaMAConfig(
        block_size=2048, vocab_size=vocab_size, n_layer=n_layer,
        n_head=n_head, n_embd=n_embd, quantize="int4", quant_groupsize=128,
        param_dtype="bfloat16", compute_dtype="bfloat16",
    )
    devices = jax.devices("cpu")
    mesh = mesh_lib.make_mesh(data=1, model=mp, devices=devices[:mp])
    params = jax.jit(benchmod.random_int4_params, static_argnums=0)(
        config, jax.random.PRNGKey(0)
    )
    params = llama.unstack_layers(params)
    params = tp_lib.shard_params_tp(params, mesh, config)
    cache = tp_lib.init_tp_cache(config, mesh, batch, 256)
    _, decode_fn = tp_lib.make_tp_forward(config, mesh, params)

    tok = jnp.ones((batch, 1), jnp.int32)
    pos = jnp.full((batch,), 17, jnp.int32)
    lowered = jax.jit(decode_fn).lower(params, tok, pos, cache)
    hlo = lowered.compile().as_text()

    rows = census(hlo)
    per_kind: dict = {}
    for kind, shape, nbytes in rows:
        c, b = per_kind.get(kind, (0, 0))
        per_kind[kind] = (c + 1, b + nbytes)

    total = sum(b for _, b in per_kind.values())
    print(f"# TP decode step, {n_embd=} {n_head=} {n_layer=} mp={mp} B={batch}")
    print(f"{'collective':20} {'count':>6} {'bytes/step':>12}")
    for kind, (c, b) in sorted(per_kind.items()):
        print(f"{kind:20} {c:>6} {b:>12,}")
    print(f"{'TOTAL':20} {sum(c for c, _ in per_kind.values()):>6} {total:>12,}")
    # the weight bytes each device streams per step, for the overlap ratio
    D, I, V = config.n_embd, config.intermediate_size, config.padded_vocab_size
    wbytes = (D * 3 * D // 2 + D * D // 2 + 2 * D * I // 2 + I * D // 2) * n_layer
    wbytes = wbytes // mp + D * V // 2 // mp
    print(
        f"# per-device int4 weight stream: {wbytes:,} bytes/step -> "
        f"collectives are {100 * total / max(1, wbytes):.2f}% of the weight "
        f"traffic a psum can hide behind"
    )
    for kind, shape, nbytes in rows:
        print(f"  {kind:20} {nbytes:>10,}  {shape[:90]}")


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(main)
