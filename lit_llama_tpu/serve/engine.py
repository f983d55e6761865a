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
  ``slot_pos``, per-slot sampling keys, inactive slots compute but are ignored
  (branchless; a slot's output is discarded on the host).

The host-side scheduler is plain Python: admit-from-queue, step, harvest.
Multi-host scaling composes with the mesh exactly like generate: shard the
batch axis over ``data`` and heads over ``model``.
"""

from __future__ import annotations

import functools
import itertools
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lit_llama_tpu.models import llama
from lit_llama_tpu.models.config import LLaMAConfig
from lit_llama_tpu.models.generate import sample_logits
from lit_llama_tpu.ops.rope import build_rope_cache


@dataclass
class Request:
    id: int
    prompt: np.ndarray
    max_new_tokens: int
    temperature: float = 0.0
    top_k: Optional[int] = None
    eos_id: Optional[int] = None
    # filled by the engine
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


class DecodeEngine:
    def __init__(
        self,
        params,
        config: LLaMAConfig,
        max_batch: int = 8,
        max_seq_length: Optional[int] = None,
        prefill_buckets=(32, 64, 128, 256, 512, 1024, 2048),
    ):
        self.params = params
        self.config = config
        self.B = max_batch
        self.S = min(max_seq_length or config.block_size, config.block_size)
        self.buckets = tuple(b for b in prefill_buckets if b <= self.S) or (self.S,)
        dtype = jnp.dtype(config.compute_dtype)
        self.rope = build_rope_cache(config.block_size, config.head_size)
        self.cache = llama.init_kv_cache(config, self.B, self.S, dtype)
        self.slot_pos = jnp.zeros((self.B,), jnp.int32)
        self.last_tok = jnp.zeros((self.B, 1), jnp.int32)
        self.key = jax.random.PRNGKey(0)
        # host-side state
        self.slot_req: List[Optional[Request]] = [None] * self.B
        self.queue: List[Request] = []
        self.finished: Dict[int, Request] = {}
        self._ids = itertools.count()

        cfg = config

        @functools.partial(jax.jit, donate_argnums=(0,))
        def prefill(cache, params, tokens, slot, true_len):
            """tokens: (1, T_bucket). Writes slot's cache rows [0, T) and returns
            the logits at the last real prompt position."""
            T = tokens.shape[1]
            slot_cache = jax.tree_util.tree_map(
                lambda c: jax.lax.dynamic_slice_in_dim(c, slot, 1, axis=1), cache
            )
            logits, slot_cache = llama.forward(
                params,
                tokens,
                cfg,
                rope_cache=self.rope,
                input_pos=jnp.arange(T),
                kv_cache=slot_cache,
            )
            cache = jax.tree_util.tree_map(
                lambda c, sc: jax.lax.dynamic_update_slice_in_dim(c, sc, slot, axis=1),
                cache,
                slot_cache,
            )
            last = jax.lax.dynamic_index_in_dim(logits[0], true_len - 1, keepdims=False)
            return cache, last.astype(jnp.float32)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(cache, params, tokens, slot_pos):
            logits, cache = llama.forward(
                params,
                tokens,
                cfg,
                rope_cache=self.rope,
                slot_pos=slot_pos,
                kv_cache=cache,
            )
            return cache, logits[:, -1].astype(jnp.float32)

        self._prefill = prefill
        self._step = step

    # -- public API ---------------------------------------------------------

    def submit(
        self,
        prompt: np.ndarray,
        max_new_tokens: int,
        temperature: float = 0.0,
        top_k: Optional[int] = None,
        eos_id: Optional[int] = None,
    ) -> int:
        prompt = np.asarray(prompt, np.int32)
        if len(prompt) >= self.S:
            prompt = prompt[-(self.S - 1) :]
        req = Request(
            next(self._ids), prompt, max_new_tokens, temperature, top_k, eos_id
        )
        self.queue.append(req)
        return req.id

    @property
    def n_active(self) -> int:
        return sum(r is not None for r in self.slot_req)

    def has_work(self) -> bool:
        return bool(self.queue) or self.n_active > 0

    def step_once(self) -> List[Request]:
        """Admit queued requests into free slots, run one decode step for all
        active slots, harvest finished requests. Returns newly finished."""
        self._admit()
        if self.n_active == 0:
            return []
        self.cache, logits = self._step(
            self.cache, self.params, self.last_tok, self.slot_pos
        )
        return self._harvest(logits)

    def run(self) -> Dict[int, Request]:
        """Drain queue + active slots to completion."""
        while self.has_work():
            self.step_once()
        out, self.finished = self.finished, {}
        return out

    # -- internals ----------------------------------------------------------

    def _admit(self) -> None:
        for b in range(self.B):
            if not self.queue:
                break
            if self.slot_req[b] is not None:
                continue
            req = self.queue.pop(0)
            T = len(req.prompt)
            Tb = _bucket(T, self.buckets)
            padded = np.zeros((1, Tb), np.int32)
            padded[0, :T] = req.prompt
            self.cache, last_logits = self._prefill(
                self.cache,
                self.params,
                jnp.asarray(padded),
                jnp.int32(b),
                jnp.int32(T),
            )
            tok = self._sample_one(last_logits, req)
            req.first_token_t = time.perf_counter()
            req.generated.append(int(tok))
            self.slot_req[b] = req
            self.slot_pos = self.slot_pos.at[b].set(T)
            self.last_tok = self.last_tok.at[b, 0].set(tok)
            if self._finished(req):
                self._retire(b)

    def _sample_one(self, logits, req: Request):
        self.key, sub = jax.random.split(self.key)
        return sample_logits(logits, sub, req.temperature, req.top_k)

    def _harvest(self, logits) -> List[Request]:
        done: List[Request] = []
        logits_np = None
        for b, req in enumerate(self.slot_req):
            if req is None:
                continue
            tok = self._sample_one(logits[b], req)
            req.generated.append(int(tok))
            self.slot_pos = self.slot_pos.at[b].add(1)
            self.last_tok = self.last_tok.at[b, 0].set(tok)
            if self._finished(req) or int(self.slot_pos[b]) >= self.S - 1:
                done.append(req)
                self._retire(b)
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
        self.slot_pos = self.slot_pos.at[b].set(0)
