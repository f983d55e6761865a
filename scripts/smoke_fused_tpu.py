"""On-chip smoke for the fused decode kernels (Mosaic legality + numerics).

Interpret mode (tests/test_fused_layer.py) validates semantics on CPU but not
Mosaic lowering (unsupported casts, VMEM overruns, DMA shapes). This runs the
same parities on the real chip at a tiny 7B-like geometry (hs=128) so failures
surface with ~1-minute compiles instead of inside the 7B bench.

Usage: python scripts/smoke_fused_tpu.py  (on TPU; no flags)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.resolve()))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from lit_llama_tpu import LLaMAConfig, init_params
    from lit_llama_tpu.models import llama
    from lit_llama_tpu.ops import fused_layer
    from lit_llama_tpu.ops.attention import attention_xla
    from lit_llama_tpu.ops.decode_attention import decode_attention_write_pallas
    from lit_llama_tpu.ops.rope import build_rope_cache, rope_half_row
    from lit_llama_tpu.utils.cli import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    failures = 0

    cfg = LLaMAConfig(
        block_size=256, vocab_size=256, n_layer=2, n_head=4, n_embd=512,
        quantize="int4", quant_groupsize=128,
        param_dtype="bfloat16", compute_dtype="bfloat16",
    )
    dense = init_params(cfg.replace(quantize=None), jax.random.PRNGKey(0))
    qparams = llama.unstack_layers(llama.quantize_params(dense, cfg))
    fparams, fcfg = fused_layer.prepare_fused_params(qparams, cfg)
    D, H, hs, S = cfg.n_embd, cfg.n_head, cfg.head_size, 128
    rng = np.random.default_rng(0)

    # --- whole-layer kernel (packed bf16-pair cache) vs XLA block ----------
    kv = {
        "k": jnp.asarray(rng.normal(size=(1, H, S, hs)) * 0.3, jnp.bfloat16),
        "v": jnp.asarray(rng.normal(size=(1, H, S, hs)) * 0.3, jnp.bfloat16),
    }
    kvp = {n: fused_layer.pack_kv(c) for n, c in kv.items()}
    x = jnp.asarray(rng.normal(size=(1, D)) * 0.5, jnp.bfloat16)
    lp = fparams["h"][0]
    pos = jnp.int32(37)
    rope_cache = build_rope_cache(fcfg.block_size, hs)

    rope = jnp.take(rope_cache, pos[None], axis=0)[:, None]
    mask = (jnp.arange(S) <= pos)[None, None, None, :]
    t0 = time.time()
    ref_out, ref_kv = llama._block(lp, x[None], rope, mask, fcfg, kv, pos % S, False)
    cosf, sinf = rope_half_row(rope_cache, pos, hs)
    try:
        got_out, got_kvp = fused_layer.decode_layer_fused(
            x, lp, kvp, cosf, sinf, pos % S, pos, fcfg
        )
        got_k = fused_layer.unpack_kv(got_kvp["k"])
        err = float(
            jnp.max(jnp.abs(got_out.astype(jnp.float32) - ref_out[0].astype(jnp.float32)))
        )
        kerr = float(
            jnp.max(jnp.abs(got_k.astype(jnp.float32) - ref_kv["k"].astype(jnp.float32)))
        )
        ok = err < 0.15 and kerr < 0.02
        failures += not ok
        print(f"decode_layer_fused: {'OK' if ok else 'FAIL'} "
              f"(|dout|={err:.4f} |dk|={kerr:.4f}, {time.time()-t0:.0f}s)")
    except Exception as e:  # noqa: BLE001
        failures += 1
        print(f"decode_layer_fused: EXCEPTION {type(e).__name__}: {str(e)[:400]}")

    # --- lm_head fusion ------------------------------------------------------
    try:
        from lit_llama_tpu.ops.linear import linear
        from lit_llama_tpu.ops.norm import rms_norm

        ref_logits = linear(fparams["lm_head"], rms_norm(x, fparams["ln_f"]))
        got_logits = fused_layer.lm_head_fused(x, fparams["ln_f"], fparams["lm_head"], fcfg)
        err = float(jnp.max(jnp.abs(
            got_logits.astype(jnp.float32) - ref_logits.astype(jnp.float32)
        )))
        ok = err < 0.1
        failures += not ok
        print(f"lm_head_fused: {'OK' if ok else 'FAIL'} (|d|={err:.4f})")
    except Exception as e:  # noqa: BLE001
        failures += 1
        print(f"lm_head_fused: EXCEPTION {type(e).__name__}: {str(e)[:400]}")

    # --- fused write+attention (serving) ------------------------------------
    try:
        B = 3
        q = jnp.asarray(rng.normal(size=(B, H, 1, hs)), jnp.bfloat16)
        kn = jnp.asarray(rng.normal(size=(B, H, 1, hs)), jnp.bfloat16)
        vn = jnp.asarray(rng.normal(size=(B, H, 1, hs)), jnp.bfloat16)
        kc = jnp.asarray(rng.normal(size=(B, H, S, hs)), jnp.bfloat16)
        vc = jnp.asarray(rng.normal(size=(B, H, S, hs)), jnp.bfloat16)
        posv = jnp.asarray([0, 64, S + 7], jnp.int32)
        wp = posv % S
        kc_ref = kc.at[jnp.arange(B), :, wp].set(kn[:, :, 0])
        vc_ref = vc.at[jnp.arange(B), :, wp].set(vn[:, :, 0])
        maskv = (jnp.arange(S)[None, :] <= posv[:, None])[:, None, None, :]
        y_ref = attention_xla(q, kc_ref, vc_ref, maskv)
        y, kc2, vc2 = decode_attention_write_pallas(
            q, kn, vn, fused_layer.pack_kv(kc), fused_layer.pack_kv(vc), posv
        )
        kc2 = fused_layer.unpack_kv(kc2)
        err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - y_ref.astype(jnp.float32))))
        cerr = float(jnp.max(jnp.abs(kc2.astype(jnp.float32) - kc_ref.astype(jnp.float32))))
        ok = err < 0.05 and cerr == 0.0
        failures += not ok
        print(f"decode_attention_write: {'OK' if ok else 'FAIL'} "
              f"(|dy|={err:.4f} |dcache|={cerr})")
    except Exception as e:  # noqa: BLE001
        failures += 1
        print(f"decode_attention_write: EXCEPTION {type(e).__name__}: {str(e)[:400]}")

    # --- multi-layer launch (2 blocks in one kernel, chained DMA stream) ----
    try:
        x2, kvs2 = fused_layer.decode_layers_fused(
            x, (fparams["h"][0], fparams["h"][1]),
            (dict(kvp), {n: fused_layer.pack_kv(c) for n, c in kv.items()}),
            cosf, sinf, pos % S, pos, fcfg,
        )
        xr = x
        for lpp, kvr in zip(
            (fparams["h"][0], fparams["h"][1]),
            (dict(kvp), {n: fused_layer.pack_kv(c) for n, c in kv.items()}),
        ):
            xr, _ = fused_layer.decode_layer_fused(
                xr, lpp, kvr, cosf, sinf, pos % S, pos, fcfg
            )
        err = float(jnp.max(jnp.abs(
            x2.astype(jnp.float32) - xr.astype(jnp.float32)
        )))
        ok = err < 0.05
        failures += not ok
        print(f"decode_layers_fused (2-per-launch): {'OK' if ok else 'FAIL'} (|d|={err:.4f})")
    except Exception as e:  # noqa: BLE001
        failures += 1
        print(f"decode_layers_fused (2-per-launch): EXCEPTION {type(e).__name__}: {str(e)[:400]}")

    # --- pipelined write+attention (both formulations) -----------------------
    from lit_llama_tpu.ops.decode_attention import decode_attention_write_pipelined

    for mxu in (True, False):
        name = f"decode_attention_write_pipelined(mxu={mxu})"
        try:
            B = 3
            q = jnp.asarray(rng.normal(size=(B, H, 1, hs)), jnp.bfloat16)
            kn = jnp.asarray(rng.normal(size=(B, H, 1, hs)), jnp.bfloat16)
            vn = jnp.asarray(rng.normal(size=(B, H, 1, hs)), jnp.bfloat16)
            kc = jnp.asarray(rng.normal(size=(B, H, S, hs)), jnp.bfloat16)
            vc = jnp.asarray(rng.normal(size=(B, H, S, hs)), jnp.bfloat16)
            posv = jnp.asarray([0, 64, S + 7], jnp.int32)
            wp = posv % S
            kc_ref = kc.at[jnp.arange(B), :, wp].set(kn[:, :, 0])
            vc_ref = vc.at[jnp.arange(B), :, wp].set(vn[:, :, 0])
            maskv = (jnp.arange(S)[None, :] <= posv[:, None])[:, None, None, :]
            y_ref = attention_xla(q, kc_ref, vc_ref, maskv)
            y, kc2, vc2 = decode_attention_write_pipelined(
                q, kn, vn, fused_layer.pack_kv(kc), fused_layer.pack_kv(vc),
                posv, mxu=mxu,
            )
            kc2 = fused_layer.unpack_kv(kc2)
            err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - y_ref.astype(jnp.float32))))
            cerr = float(jnp.max(jnp.abs(kc2.astype(jnp.float32) - kc_ref.astype(jnp.float32))))
            ok = err < 0.05 and cerr == 0.0
            failures += not ok
            print(f"{name}: {'OK' if ok else 'FAIL'} (|dy|={err:.4f} |dcache|={cerr})")
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"{name}: EXCEPTION {type(e).__name__}: {str(e)[:400]}")

    # --- LoRA side-branch through the whole-layer kernel ----------------------
    try:
        from lit_llama_tpu.models.config import LoRAConfig

        lcfg = cfg.replace(lora=LoRAConfig(r=4, alpha=8.0, dropout=0.0))
        ldense = init_params(lcfg.replace(quantize=None), jax.random.PRNGKey(1))
        ldense["h"]["attn"]["c_attn"]["lora_b"] = (
            jax.random.normal(
                jax.random.PRNGKey(9), ldense["h"]["attn"]["c_attn"]["lora_b"].shape
            ).astype(jnp.bfloat16)
            * 0.1
        )
        lq = llama.unstack_layers(llama.quantize_params(ldense, lcfg))
        lfp, lfc = fused_layer.prepare_fused_params(lq, lcfg)
        lpl = lfp["h"][0]
        ref_out, _ = llama._block(lpl, x[None], rope, mask, lfc, dict(kv), pos % S, False)
        got_out, _ = fused_layer.decode_layer_fused(
            x, lpl, {n: fused_layer.pack_kv(c) for n, c in kv.items()},
            cosf, sinf, pos % S, pos, lfc,
        )
        err = float(jnp.max(jnp.abs(
            got_out.astype(jnp.float32) - ref_out[0].astype(jnp.float32)
        )))
        ok = err < 0.15
        failures += not ok
        print(f"decode_layer_fused+lora: {'OK' if ok else 'FAIL'} (|d|={err:.4f})")
    except Exception as e:  # noqa: BLE001
        failures += 1
        print(f"decode_layer_fused+lora: EXCEPTION {type(e).__name__}: {str(e)[:400]}")

    # --- batched block-half kernels (serving) --------------------------------
    try:
        from lit_llama_tpu.models.llama import (
            _block_slot_fused, _slot_rope_tables, forward,
        )

        B = 8
        kvb = {
            "k": jnp.asarray(rng.normal(size=(B, H, S, hs)) * 0.3, jnp.bfloat16),
            "v": jnp.asarray(rng.normal(size=(B, H, S, hs)) * 0.3, jnp.bfloat16),
        }
        kvbp = {n: fused_layer.pack_kv(c) for n, c in kvb.items()}
        xb = jnp.asarray(rng.normal(size=(B, D)) * 0.5, jnp.bfloat16)
        slot_pos = jnp.asarray(rng.integers(1, S - 1, size=B), jnp.int32)
        rope_rows = jnp.take(rope_cache, slot_pos, axis=0)[:, None]
        cos3, sin3 = _slot_rope_tables(rope_rows, fcfg)
        gotb, _ = _block_slot_fused(
            fparams["h"][0], xb, cos3, sin3, fcfg, kvbp, slot_pos
        )
        # XLA reference: the slot_pos forward path with the fused path off
        import os as _os

        _os.environ["LIT_LLAMA_TPU_SERVE_KERNEL"] = "0"
        mask = (jnp.arange(S)[None, :] <= slot_pos[:, None])[:, None, None, :]
        refb, _ = llama._block(
            fparams["h"][0], xb[:, None, :], rope_rows, mask, fcfg,
            dict(kvb), slot_pos % S, False, None, None, slot_pos,
        )
        del _os.environ["LIT_LLAMA_TPU_SERVE_KERNEL"]
        err = float(jnp.max(jnp.abs(
            gotb.astype(jnp.float32) - refb[:, 0].astype(jnp.float32)
        )))
        ok = err < 0.25  # bf16 residual rounding differs (fused keeps f32)
        failures += not ok
        print(f"block_head/tail_fused (B=8): {'OK' if ok else 'FAIL'} (|d|={err:.4f})")
    except Exception as e:  # noqa: BLE001
        failures += 1
        print(f"block_head/tail_fused: EXCEPTION {type(e).__name__}: {str(e)[:400]}")

    # --- end-to-end tiny fused generate --------------------------------------
    try:
        from lit_llama_tpu.models import generate as gen

        prompt = np.asarray([5, 23, 81, 2, 40], np.int32)
        ref = gen.generate(qparams, prompt, 12, config=cfg, max_seq_length=32,
                           temperature=0.0)
        got = gen.generate(fparams, prompt, 12, config=fcfg, max_seq_length=32,
                           temperature=0.0)
        # bf16: the fused path carries the residual stream in f32 (the XLA
        # path rounds to bf16 at each add), so a greedy near-tie can flip a
        # late token; require a long exact prefix rather than full equality
        # (the f32-compute parity test in tests/test_fused_layer.py is exact)
        prefix = 0
        for a, b in zip(got.tolist(), ref.tolist()):
            if a != b:
                break
            prefix += 1
        ok = prefix >= len(prompt) + 8
        failures += not ok
        print(f"fused generate: {'OK' if ok else 'FAIL'} (exact prefix {prefix}/{len(ref)})")
    except Exception as e:  # noqa: BLE001
        failures += 1
        print(f"fused generate: EXCEPTION {type(e).__name__}: {str(e)[:400]}")

    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
