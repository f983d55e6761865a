"""Continuous-batching decode engine.

Beyond the reference's capabilities (it decodes one request at a time,
generate.py:20-91); this is the north-star serving engine (BASELINE.json
config #5): a slotted KV cache where every batch slot runs an independent
request at its own position, new requests prefill into free slots while other
slots keep decoding, and finished slots are recycled immediately.

All device work is two compiled programs:
* ``prefill``: run a (1, T_bucket) prompt through the model writing slot b's
  cache (prompt lengths bucketed to powers of two to bound compile count);
  positions past the true length hold garbage that is masked until each is
  overwritten by the decode step that reaches it.
* ``step``: one fused decode step for ALL slots — per-slot positions via
  ``slot_pos``, per-slot sampling (temperature vector; greedy where 0) with
  per-slot PRNG keys, ONE host sync per step for the sampled tokens. Inactive
  slots compute but are ignored on the host (branchless).

``top_k`` and temperature are per-request (per-slot vectors); the engine-wide
``top_k`` sets both the default and the static compile-time cap (one exact
top-``max`` sort serves every slot). The host-side scheduler is plain Python:
admit-from-queue, step, harvest. Multi-host scaling composes with the mesh exactly like generate:
shard the batch axis over ``data`` and heads over ``model``.
"""

from __future__ import annotations

import functools
import itertools
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lit_llama_tpu.models import llama
from lit_llama_tpu.models.config import LLaMAConfig
from lit_llama_tpu.ops.rope import build_rope_cache


@dataclass
class Request:
    id: int
    prompt: np.ndarray
    max_new_tokens: int
    temperature: float = 0.0
    top_k: int = 0  # 0 = no top-k filtering for this request
    eos_id: Optional[int] = None
    # filled by the engine
    prefilled: int = 0  # prompt tokens already written to the slot's cache
    generated: List[int] = field(default_factory=list)
    submit_t: float = field(default_factory=time.perf_counter)
    first_token_t: Optional[float] = None
    done_t: Optional[float] = None

    @property
    def ttft(self) -> Optional[float]:
        return None if self.first_token_t is None else self.first_token_t - self.submit_t


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def _sample_rows(logits, keys, temps, top_ks, max_top_k):
    """Vectorized per-slot sampling: greedy where temperature == 0.

    ``top_ks`` is a per-slot int32 vector (0 disables top-k for that slot);
    ``max_top_k`` is the static compile-time cap — one exact top-``max_top_k``
    sort serves every slot, each picking its own k-th value as the cutoff."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / jnp.maximum(temps, 1e-6)[:, None]
    if max_top_k is not None:
        vals = jax.lax.top_k(scaled, max_top_k)[0]  # (B, max_k) desc-sorted
        idx = jnp.clip(top_ks, 1, max_top_k)[:, None] - 1
        kth = jnp.take_along_axis(vals, idx, axis=1)  # (B, 1)
        scaled = jnp.where((top_ks > 0)[:, None] & (scaled < kth), -jnp.inf, scaled)
    sampled = jax.vmap(jax.random.categorical)(keys, scaled).astype(jnp.int32)
    return jnp.where(temps == 0.0, greedy, sampled)


class DecodeEngine:
    def __init__(
        self,
        params,
        config: LLaMAConfig,
        max_batch: int = 8,
        max_seq_length: Optional[int] = None,
        top_k: Optional[int] = 200,
        prefill_buckets=(32, 64, 128, 256, 512, 1024, 2048),
        seed: int = 0,
        steps_per_sync: int = 4,
        prefill_chunk: int = 512,
        prefill_budget: Optional[int] = 1024,
        mesh=None,
    ):
        """``mesh``: a {data, model} jax mesh. When its model axis is > 1, the
        engine shards heads/MLP/vocab across it via the shard_map TP path
        (parallel/tp.py) — multi-chip continuous batching with the KV cache
        tensor-sharded over heads (north-star config #5). When its data axis
        is > 1 the slot (batch) axis shards over it: weights are replicated
        per data group, each group's HBM holds only its own B/dp slots' cache,
        and the decode step runs with no cross-data communication (prefill
        reshards one slot's rows in/out). Both axes compose (dp x mp).

        ``prefill_chunk`` / ``prefill_budget``: admission control (VERDICT r1
        weak #3 — a burst of long prompts must not starve in-flight decodes).
        Prompts longer than ``prefill_chunk`` prefill in fixed-size chunks
        spread across successive ``step_once`` calls; each ``step_once`` spends
        at most ``prefill_budget`` prompt tokens on prefill (always at least
        one chunk, so admission cannot stall) before running the decode chunk.
        ``prefill_budget=None`` restores drain-the-queue admission; chunking is
        disabled under tensor parallelism (the sharded prefill is from-zero
        only)."""
        self.mesh = mesh
        mp = mesh.shape.get("model", 1) if mesh is not None else 1
        dp = mesh.shape.get("data", 1) if mesh is not None else 1
        if dp > 1 and max_batch % dp:
            raise ValueError(
                f"max_batch={max_batch} must be divisible by the mesh data "
                f"axis ({dp}) — slots shard evenly across data groups"
            )
        if mp > 1:
            from lit_llama_tpu.parallel import tp as tp_lib

            self.params = tp_lib.shard_params_tp(params, mesh, config)
            self._fwd_prefill, self._fwd_decode = tp_lib.make_sharded_forwards(
                config, mesh, self.params
            )
        else:
            # inference layout: unrolled layers, no per-step weight-slice copies
            self.params = llama.unstack_layers(params)
            # half-rotation basis for the batched fused block kernels (no-op
            # off-TPU / for unsupported models); the updated config also makes
            # prefill apply the matching rope
            from lit_llama_tpu.ops.fused_layer import maybe_prepare_fused

            self.params, config = maybe_prepare_fused(self.params, config)
            if dp > 1:
                # data-parallel serving (VERDICT r2 next #6): weights replicated
                # per data group, slots sharded. The decode step runs inside
                # shard_map (NOT plain jit-SPMD): GSPMD cannot partition the
                # Pallas custom calls of the fused serving kernels, so each
                # data group must execute them on its LOCAL B/dp slots.
                from jax import shard_map
                from jax.sharding import NamedSharding, PartitionSpec as P

                self.params = jax.device_put(
                    self.params, NamedSharding(mesh, P())
                )
                cfg_dp, rope_dp = config, build_rope_cache(
                    config.block_size, config.head_size
                )

                def _decode_local(params, tokens, slot_pos, cache):
                    return llama.forward(
                        params, tokens, cfg_dp, rope_cache=rope_dp,
                        slot_pos=slot_pos, kv_cache=cache,
                    )

                self._fwd_decode = shard_map(
                    _decode_local,
                    mesh=mesh,
                    in_specs=(P(), P("data"), P("data"), P("data")),
                    out_specs=(P("data"), P("data")),
                    check_vma=False,
                )
            self._fwd_prefill = None
            if dp <= 1:
                self._fwd_decode = None
        self.config = config
        self.B = max_batch
        self.S = min(max_seq_length or config.block_size, config.block_size)
        self.top_k = None if top_k is None else min(top_k, config.padded_vocab_size)
        self.steps_per_sync = max(1, steps_per_sync)
        self.buckets = tuple(b for b in prefill_buckets if b <= self.S) or (self.S,)
        # chunked prefill needs the continued-position forward; the TP prefill
        # path is from-zero only, so fall back to whole-prompt prefill there
        self.prefill_chunk = 0 if mp > 1 else min(prefill_chunk or 0, self.S)
        self.prefill_budget = prefill_budget
        dtype = jnp.dtype(config.compute_dtype)
        self.rope = build_rope_cache(config.block_size, config.head_size)
        if mp > 1:
            from lit_llama_tpu.parallel import tp as tp_lib

            self.cache = tp_lib.init_tp_cache(config, mesh, self.B, self.S, dtype)
        else:
            # per-layer tuple matching the unstacked weights (no per-step
            # stacked-cache slice/re-stack copies; batch axis is ndim-4 in
            # both layouts, which the prefill slice lambdas rely on).
            # Under the batched fused kernels with bf16 compute, the cache is
            # the packed bf16-pair uint32 layout (ops/fused_layer.pack_kv):
            # bf16 HBM density with only 32-bit DMAs — raw bf16 caches cannot
            # be DMA'd at dynamic offsets on this Mosaic toolchain.
            packed = False
            if dtype == jnp.bfloat16 and config.kv_cache_dtype is None:
                from lit_llama_tpu.ops.fused_layer import use_serve_fused

                h = self.params.get("h")
                if isinstance(h, (list, tuple)) and use_serve_fused(
                    config, h[0], batch=self.B
                ):
                    if self.S % 16:
                        # pair words hold two positions, and the kernel's
                        # strided cache DMAs need 8-aligned word-row counts
                        self.S -= self.S % 16
                    packed = self.S <= 512 or self.S % 256 == 0
            self.cache = llama.unstack_kv_cache(
                llama.init_kv_cache(config, self.B, self.S, dtype, packed=packed)
            )
            if dp > 1:
                # slot rows live on their data group's HBM — B/dp slots per
                # group instead of every chip holding the full slot cache
                from jax.sharding import NamedSharding, PartitionSpec

                batch_sharded = NamedSharding(mesh, PartitionSpec("data"))
                self.cache = jax.tree_util.tree_map(
                    lambda c: jax.device_put(c, batch_sharded), self.cache
                )
        self.slot_pos = np.zeros((self.B,), np.int32)
        self.last_tok = np.zeros((self.B,), np.int32)
        self.temps = np.zeros((self.B,), np.float32)
        self.top_ks = np.zeros((self.B,), np.int32)  # 0 = slot top-k disabled
        self.key = jax.random.PRNGKey(seed)
        # host-side state
        self.slot_req: List[Optional[Request]] = [None] * self.B
        self.queue: List[Request] = []
        self.finished: Dict[int, Request] = {}
        self._ids = itertools.count()

        cfg = config
        rope = self.rope
        top_k_static = self.top_k
        fwd_prefill = self._fwd_prefill or (
            lambda params, tokens, input_pos, cache: llama.forward(
                params, tokens, cfg, rope_cache=rope, input_pos=input_pos,
                kv_cache=cache, prefill_from_zero=True,
            )
        )
        fwd_decode = self._fwd_decode or (
            lambda params, tokens, slot_pos, cache: llama.forward(
                params, tokens, cfg, rope_cache=rope, slot_pos=slot_pos,
                kv_cache=cache,
            )
        )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def prefill(cache, params, tokens, slot, true_len, temp, tk, key):
            """tokens: (1, T_bucket). Writes slot's cache rows [0, T) and
            samples the first generated token from the last real position."""
            T = tokens.shape[1]
            slot_cache = jax.tree_util.tree_map(
                lambda c: jax.lax.dynamic_slice_in_dim(c, slot, 1, axis=c.ndim - 4), cache
            )
            logits, slot_cache = fwd_prefill(params, tokens, jnp.arange(T), slot_cache)
            cache = jax.tree_util.tree_map(
                lambda c, sc: jax.lax.dynamic_update_slice_in_dim(c, sc, slot, axis=c.ndim - 4),
                cache,
                slot_cache,
            )
            last = jax.lax.dynamic_index_in_dim(logits[0], true_len - 1, keepdims=False)
            tok = _sample_rows(
                last[None].astype(jnp.float32), key[None], temp[None], tk[None],
                top_k_static,
            )[0]
            return cache, tok

        @functools.partial(jax.jit, donate_argnums=(0,))
        def prefill_cont(cache, params, tokens, slot, start, true_len, temp, tk, key):
            """Continue a chunked prefill: ``tokens`` (1, C) are prompt tokens
            [start, start+C); cache rows [start, start+true_len) are written
            and attention covers the slot's full history via the positional
            mask. Samples from the chunk's last real position (only the final
            chunk's sample is used)."""
            C = tokens.shape[1]
            slot_cache = jax.tree_util.tree_map(
                lambda c: jax.lax.dynamic_slice_in_dim(c, slot, 1, axis=c.ndim - 4), cache
            )
            logits, slot_cache = llama.forward(
                params, tokens, cfg, rope_cache=rope,
                input_pos=jnp.arange(C) + start, kv_cache=slot_cache,
            )
            cache = jax.tree_util.tree_map(
                lambda c, sc: jax.lax.dynamic_update_slice_in_dim(c, sc, slot, axis=c.ndim - 4),
                cache,
                slot_cache,
            )
            last = jax.lax.dynamic_index_in_dim(logits[0], true_len - 1, keepdims=False)
            tok = _sample_rows(
                last[None].astype(jnp.float32), key[None], temp[None], tk[None],
                top_k_static,
            )[0]
            return cache, tok

        @functools.partial(
            jax.jit, donate_argnums=(0,), static_argnames=("n_steps",)
        )
        def step(cache, params, tokens, slot_pos, temps, top_ks, key, n_steps=1):
            """n_steps decode steps fully on device — the host syncs once per
            chunk instead of once per token (the per-step host round trip costs
            more than the compute on remote-attached TPUs)."""

            def body(carry, _):
                cache, tok, pos, key = carry
                logits, cache = fwd_decode(params, tok[:, None], pos, cache)
                key, sub = jax.random.split(key)
                keys = jax.random.split(sub, tok.shape[0])
                nxt = _sample_rows(
                    logits[:, -1].astype(jnp.float32), keys, temps, top_ks,
                    top_k_static,
                )
                return (cache, nxt, pos + 1, key), nxt

            (cache, _, _, _), toks = jax.lax.scan(
                body, (cache, tokens, slot_pos, key), None, length=n_steps
            )
            return cache, toks  # (n_steps, B)

        self._prefill = prefill
        self._prefill_cont = prefill_cont
        self._step = step

    # -- public API ---------------------------------------------------------

    def warmup(self) -> None:
        """Compile every prefill bucket (and the chunked-prefill width) plus
        the decode chunk before serving traffic. Without this, the first
        request at each new prompt-length bucket pays a multi-second (cold:
        multi-minute) compile inside its TTFT — a mixed-length benchmark run
        measured 71 tok/s aggregate uncompiled vs ~480 warm at batch 8."""
        if self.prefill_chunk:
            # prompts longer than the chunk take the chunked path, so buckets
            # wider than _bucket(chunk) are never dispatched — compiling them
            # would waste multi-second (cold: multi-minute) warmup work
            cap = _bucket(self.prefill_chunk, self.buckets)
            widths = tuple(b for b in self.buckets if b <= cap)
        else:
            widths = self.buckets
        lengths = {min(w, self.S - 1) for w in widths}
        lengths.add(self.S - 1)  # longest prompt: exercises chunked prefill
        for n in sorted(lengths):
            # max_new_tokens=2: one token comes from the prefill itself, so a
            # 1-token request retires before the decode chunk ever runs and
            # its (multi-second) compile would land on the first real request
            self.submit(np.ones((n,), np.int32), 2)
            self.run()

    def submit(
        self,
        prompt: np.ndarray,
        max_new_tokens: int,
        temperature: float = 0.0,
        top_k: Optional[int] = None,  # None -> engine default; must be <= the engine cap
        eos_id: Optional[int] = None,
    ) -> int:
        if top_k is None:
            tk = self.top_k or 0
        else:
            if self.top_k is None:
                raise ValueError(
                    "per-request top_k requires the engine to be built with a "
                    "top_k cap (DecodeEngine(top_k=...)); this engine has none"
                )
            if not (1 <= top_k <= self.top_k):
                raise ValueError(
                    f"top_k={top_k} out of range [1, {self.top_k}] (the engine "
                    "cap is a compile-time constant; raise DecodeEngine(top_k=...))"
                )
            tk = top_k
        prompt = np.asarray(prompt, np.int32)
        # Without chunked prefill the whole prompt must fit one prefill bucket:
        # a wider-than-bucket prompt would loop through prefill_cont, whose
        # padded bucket write could run past the cache (and under TP that path
        # doesn't exist at all — the sharded prefill is from-zero only).
        limit = self.S - 1 if self.prefill_chunk else min(self.S - 1, self.buckets[-1])
        if len(prompt) > limit:
            prompt = prompt[-limit:]
        req = Request(
            next(self._ids), prompt, max_new_tokens, temperature, top_k=tk,
            eos_id=eos_id,
        )
        self.queue.append(req)
        return req.id

    @property
    def n_active(self) -> int:
        return sum(r is not None for r in self.slot_req)

    def has_work(self) -> bool:
        return bool(self.queue) or self.n_active > 0

    def step_once(self) -> List[Request]:
        """Admit queued requests into free slots, run ``steps_per_sync`` decode
        steps for all active slots, harvest finished requests. Returns newly
        finished. Slots that finish mid-chunk decode garbage for the remainder
        of the chunk (discarded; their cache is safely overwritten by the next
        occupant's prefill + masked decode)."""
        self._admit()
        # parked slots (prefill still in progress) don't decode usefully; skip
        # the device chunk when nothing else is running
        if not any(
            r is not None and r.prefilled >= len(r.prompt) for r in self.slot_req
        ):
            return []
        # FIXED chunk size: n_steps is a static compile parameter, so varying it
        # would trigger a recompile per distinct value. Overshooting a finished
        # slot is safe (extra tokens are discarded and out-of-range cache
        # writes are dropped), so always run the full chunk.
        n = self.steps_per_sync
        self.key, sub = jax.random.split(self.key)
        self.cache, toks = self._step(
            self.cache,
            self.params,
            jnp.asarray(self.last_tok),
            jnp.asarray(self.slot_pos),
            jnp.asarray(self.temps),
            jnp.asarray(self.top_ks),
            sub,
            n_steps=n,
        )
        return self._harvest(np.asarray(toks))

    def run(self) -> Dict[int, Request]:
        """Drain queue + active slots to completion."""
        while self.has_work():
            self.step_once()
        out, self.finished = self.finished, {}
        return out

    # -- internals ----------------------------------------------------------

    def _prefill_some(self, b: int, req: Request, budget: int) -> int:
        """Advance slot ``b``'s prefill by whole chunks within ``budget``
        tokens (at least one chunk, so progress is guaranteed). While
        incomplete the slot is parked: slot_pos = S-1 (decode-chunk writes land
        on a row that is rewritten before it is ever attended) with
        temperature/top_k zeroed. Returns tokens spent."""
        T = len(req.prompt)
        C = self.prefill_chunk
        spent = 0
        tok = None
        while req.prefilled < T:
            if spent > 0 and spent >= budget:
                break
            start = req.prefilled
            if C and T > C:
                # cap the final chunk so the padded write cannot run past the
                # cache (dynamic_update_slice would clamp the start and clobber
                # earlier rows); at most one extra compile per (S % C) width
                width = min(C, self.S - start)
            else:
                # whole-prompt prefill: submit() clamps prompts to buckets[-1]
                # when chunking is off, so this is always a single from-zero
                # pass (prefill_cont must not run under TP-sharded params)
                assert start == 0, "non-chunked prefill must be from-zero"
                width = _bucket(T, self.buckets)
            n = min(width, T - start)
            padded = np.zeros((1, width), np.int32)
            padded[0, :n] = req.prompt[start : start + n]
            self.key, sub = jax.random.split(self.key)
            args = (
                jnp.asarray(padded),
                jnp.int32(b),
                jnp.int32(n),
                jnp.float32(req.temperature),
                jnp.int32(req.top_k),
                sub,
            )
            if start == 0:
                self.cache, tok = self._prefill(self.cache, self.params, *args)
            else:
                self.cache, tok = self._prefill_cont(
                    self.cache, self.params, args[0], args[1],
                    jnp.int32(start), *args[2:],
                )
            req.prefilled = start + n
            spent += n
        if req.prefilled < T:  # park until the next step_once
            self.slot_pos[b] = self.S - 1
            self.temps[b] = 0.0
            self.top_ks[b] = 0
            return spent
        tok = int(tok)
        req.first_token_t = time.perf_counter()
        req.generated.append(tok)
        self.slot_pos[b] = T
        self.last_tok[b] = tok
        self.temps[b] = req.temperature
        self.top_ks[b] = req.top_k
        if self._finished(req):
            self._retire(b)
        return spent

    def _admit(self) -> None:
        budget = self.prefill_budget if self.prefill_budget is not None else 1 << 62
        # resume parked (mid-prefill) slots first — they were admitted earlier
        for b, req in enumerate(self.slot_req):
            if budget <= 0:
                return
            if req is not None and req.prefilled < len(req.prompt):
                budget -= self._prefill_some(b, req, budget)
        for b in range(self.B):
            if budget <= 0 or not self.queue:
                break
            if self.slot_req[b] is not None:
                continue
            req = self.queue.pop(0)
            self.slot_req[b] = req
            budget -= self._prefill_some(b, req, budget)

    def _harvest(self, toks: np.ndarray) -> List[Request]:
        """toks: (n_steps, B) chunk of sampled tokens."""
        n_steps = toks.shape[0]
        done: List[Request] = []
        for b, req in enumerate(self.slot_req):
            if req is None or req.prefilled < len(req.prompt):
                continue  # empty or parked mid-prefill: chunk output is garbage
            for s in range(n_steps):
                tok = int(toks[s, b])
                req.generated.append(tok)
                self.slot_pos[b] += 1
                self.last_tok[b] = tok
                # no retire-at-S-1: past the cache the slot's writes wrap its
                # ring buffer (models/llama.py slot_pos path), matching the
                # single-stream rolling window — a request may generate far
                # beyond max_seq_length with a sliding context
                if self._finished(req):
                    done.append(req)
                    self._retire(b)
                    break
        return done

    def _finished(self, req: Request) -> bool:
        if req.eos_id is not None and req.generated and req.generated[-1] == req.eos_id:
            return True
        return len(req.generated) >= req.max_new_tokens

    def _retire(self, b: int) -> None:
        req = self.slot_req[b]
        req.done_t = time.perf_counter()
        self.finished[req.id] = req
        self.slot_req[b] = None
        self.slot_pos[b] = 0
        self.temps[b] = 0.0
        self.top_ks[b] = 0
