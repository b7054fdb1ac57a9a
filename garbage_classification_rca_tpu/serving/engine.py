"""Continuous batching for the OPT/BLIP-2 serving path.

The reference has no serving layer at all (its only generation surface is
a 1-token constrained eval, blip_2_training.py:296-297). ``opt.generate``
(this repo) already serves STATIC batches: all rows prefill together and
the batch finishes when the slowest row does — a row that hits EOS at
token 2 still burns decode FLOPs for the remaining N-2 steps, and no new
request can start until the whole batch retires. At serving scale that is
the dominant throughput loss (requests' output lengths are heavy-tailed).

``GenerationServer`` fixes this the TPU-native way (the prefill/insert/
decode split used by production TPU LLM servers, e.g. JetStream): a fixed
grid of B slots with STATIC [layers, B, T, H] KV caches, and three jitted
programs with static shapes —

  * _prefill: one request's prompt (padded to max_prompt) -> its cache
    rows + first sampled token. Reuses opt.prefill, so the fused-MHA
    prefill path and int8 cache quantization apply unchanged.
  * _insert: dynamic_update_slice of those rows into the grid at a
    TRACED slot index (no per-slot recompiles), resetting that slot's
    token/progress/mask lanes.
  * _decode: ``steps_per_sync`` batched one-token steps (lax.scan over
    opt.decode_step) for ALL slots at once, with PER-SLOT progress:
    every lane carries its own write offset, learned-position index and
    attention extent, so slot 3 can be on its 14th token while slot 4 is
    on its 1st. Returns the fed tokens; the host loop retires finished
    slots (EOS fed or max_new reached) and immediately refills them from
    the queue.

Exactness contract (tests/test_serving.py): for ANY arrival order, queue
depth and slot count, each request's (tokens, valid) stream is identical
to ``opt.generate`` run on that request alone — greedy, sampled (the
per-request fold_in key), and int8-cache variants. Stale K/V from a
slot's previous occupant is never attended: a fresh occupant's attention
extent only ever unmasks generation slots it has already overwritten.

Why slots, not re-batching: re-padding/re-prefilling survivors into a new
batch (the host-side alternative) recompiles nothing either, but re-runs
prompt prefill for every surviving row on every retirement; insert is one
[layers, T, H] copy instead. Host<->device traffic per sync is just the
fed tokens ([steps_per_sync, B] int32), so the loop also serves fine over
slow links; raise ``steps_per_sync`` to amortize further (a slot then
refills at worst steps_per_sync-1 ticks late, throughput-neutral when the
queue is empty anyway).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vlm import opt as opt_mod
from ..ops import sampling as smp


@dataclass
class ServedRequest:
    """Host-side bookkeeping for one request (returned by drain/run)."""
    uid: int
    embeds: np.ndarray          # [max_prompt, H] (padded)
    mask: np.ndarray            # [max_prompt] int32
    tokens: List[int] = field(default_factory=list)
    valid: List[bool] = field(default_factory=list)
    done: bool = False          # EOS already fed
    finished: bool = False      # retired from its slot


class GenerationServer:
    """Continuous-batching greedy/sampled generation over ``slots`` lanes.

    params/cfg/lora/lora_scale/cache_dtype: as in opt.generate. Prompts
    are padded (either side) to ``max_prompt``; every request receives up
    to ``max_new`` tokens. ``rng`` seeds sampling: request #i (submit
    order) uses ``fold_in(rng, i)`` — exactly the key to pass
    opt.generate to reproduce that request standalone.

    Parallelism composes by operand placement: pre-shard ``params`` with
    parallel.tp.opt_param_specs over a 'model' mesh axis and the jitted
    programs inherit the TP layout (caches/activations follow GSPMD).
    """

    def __init__(self, params, cfg, *, slots: int, max_prompt: int,
                 max_new: int, eos_id: int = 2, lora=None,
                 lora_scale: float = 1.0,
                 sampler: Optional[smp.SamplerConfig] = None,
                 rng=None, cache_dtype=None, steps_per_sync: int = 1):
        if sampler is not None and sampler.temperature is not None \
                and rng is None:
            raise ValueError("sampling (temperature set) requires rng")
        self.params, self.cfg, self.lora = params, cfg, lora
        self.lora_scale = lora_scale
        self.slots, self.max_prompt, self.max_new = slots, max_prompt, max_new
        self.eos_id, self.sampler = eos_id, sampler or smp.GREEDY
        self.cache_dtype, self.steps_per_sync = cache_dtype, steps_per_sync
        self.rng = jax.random.PRNGKey(0) if rng is None else rng
        self.t_cache = max_prompt + max_new

        self.queue: deque[ServedRequest] = deque()
        self.requests: Dict[int, ServedRequest] = {}
        self.slot_req: List[Optional[int]] = [None] * slots
        self._next_uid = 0

        # device state (one lane per slot)
        n_layers = len(params["layers"])
        h = cfg.hidden
        if cache_dtype == "int8":
            self.caches = {
                "k": jnp.zeros((n_layers, slots, self.t_cache, h), jnp.int8),
                "k_scale": jnp.ones((n_layers, slots, self.t_cache, 1),
                                    jnp.float32),
                "v": jnp.zeros((n_layers, slots, self.t_cache, h), jnp.int8),
                "v_scale": jnp.ones((n_layers, slots, self.t_cache, 1),
                                    jnp.float32),
            }
        else:
            cdtype = jax.tree_util.tree_leaves(params)[0].dtype
            self.caches = {
                "k": jnp.zeros((n_layers, slots, self.t_cache, h), cdtype),
                "v": jnp.zeros((n_layers, slots, self.t_cache, h), cdtype),
            }
        self.tok = jnp.zeros((slots,), jnp.int32)
        self.n_fed = jnp.zeros((slots,), jnp.int32)
        self.n_valid = jnp.zeros((slots,), jnp.int32)
        self.base_mask = jnp.zeros((slots, self.t_cache), jnp.int32)
        self.req_key = jnp.zeros((slots, 2), jnp.uint32)
        self._fed_host = np.zeros((slots,), np.int64)  # host mirror of n_fed

        self._prefill = jax.jit(self._prefill_impl)
        self._insert = jax.jit(self._insert_impl, donate_argnums=(1,))
        self._decode = jax.jit(self._decode_impl, donate_argnums=(1,),
                               static_argnums=(8,))

    # ---- jitted programs -------------------------------------------------

    def _prefill_impl(self, params, lora, embeds, mask, key):
        """[1, max_prompt] prompt -> (cache rows [layers,1,T,...], tok0)."""
        h, rows = opt_mod.prefill(params, embeds, mask, self.cfg,
                                  self.max_new, lora=lora,
                                  lora_scale=self.lora_scale,
                                  cache_dtype=self.cache_dtype)
        m = mask.astype(jnp.int32)
        last = jnp.argmax(m * jnp.arange(1, m.shape[1] + 1)[None, :], axis=1)
        h_last = h[jnp.arange(h.shape[0]), last]
        tok0 = smp.sample_tokens(jax.random.fold_in(key, 0),
                                 opt_mod.lm_head(params, h_last),
                                 self.sampler)
        return rows, tok0, jnp.sum(m, axis=1)

    def _insert_impl(self, rows, caches, tok_state, nfed_state, nvalid_state,
                     bmask_state, key_state, tok0, nv, mask, key, slot):
        """Copy one request's cache rows + lane state into slot (traced)."""
        caches = jax.tree_util.tree_map(
            lambda c, r: jax.lax.dynamic_update_slice(
                c, r.astype(c.dtype), (0, slot) + (0,) * (c.ndim - 2)),
            caches, rows)
        bmask = jax.lax.dynamic_update_slice(
            bmask_state,
            jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, self.max_new))),
            (slot, 0))
        upd = lambda a, v: jax.lax.dynamic_update_index_in_dim(a, v, slot, 0)
        return (caches, upd(tok_state, tok0[0]), upd(nfed_state, 0),
                upd(nvalid_state, nv[0]), bmask,
                jax.lax.dynamic_update_slice(key_state, key[None], (slot, 0)))

    def _decode_impl(self, params, caches, lora, tok, n_fed, n_valid,
                     base_mask, req_key, n_steps):
        """n_steps batched one-token steps; returns fed tokens [n, B]."""
        b = tok.shape[0]
        slots_ids = jnp.arange(self.t_cache)[None, :]
        greedy = self.sampler.temperature is None
        emb_dtype = params["embed_tokens"]["w"].dtype

        def step(carry, _):
            caches, tok, n_fed = carry
            # per-lane progress: this token's K/V slot, learned position,
            # and attention extent (prompt + generated-so-far + itself)
            write = jnp.minimum(self.max_prompt + n_fed, self.t_cache - 1)
            pos = n_valid + n_fed + self.cfg.pos_offset
            attn = base_mask | ((slots_ids >= self.max_prompt)
                                & (slots_ids <= self.max_prompt + n_fed
                                   [:, None])).astype(jnp.int32)
            emb = opt_mod.embed_tokens(params, tok).astype(emb_dtype)
            h, caches = opt_mod.decode_step(params, caches, emb, write, pos,
                                            attn, self.cfg, lora=self.lora,
                                            lora_scale=self.lora_scale)
            logits = opt_mod.lm_head(params, h)
            if greedy:
                nxt = jnp.argmax(logits.astype(jnp.float32),
                                 axis=-1).astype(jnp.int32)
            else:
                # per-lane keys, folded with the lane's own step count —
                # row-for-row identical to a B=1 opt.generate with the
                # request's key (categorical over [1, V] per lane)
                keys = jax.vmap(jax.random.fold_in)(req_key, n_fed + 1)
                nxt = jax.vmap(
                    lambda k, lg: smp.sample_tokens(k, lg[None],
                                                    self.sampler)[0]
                )(keys, logits.astype(jnp.float32))
            return (caches, nxt, n_fed + 1), tok

        (caches, tok, n_fed), fed = jax.lax.scan(
            step, (caches, tok, n_fed), None, length=n_steps)
        del lora  # threaded for shardings only; used via self in trace
        return caches, tok, n_fed, fed

    # ---- host scheduler --------------------------------------------------

    def submit(self, inputs_embeds, attention_mask) -> int:
        """Queue one request. inputs_embeds [L, H] (or [1, L, H]) and
        attention_mask [L], L <= max_prompt, any padding side. Returns the
        request uid."""
        e = np.asarray(inputs_embeds)
        m = np.asarray(attention_mask)
        if e.ndim == 3:
            e, m = e[0], m.reshape(-1)
        l, h = e.shape
        if l > self.max_prompt:
            raise ValueError(f"prompt length {l} > max_prompt "
                             f"{self.max_prompt}")
        pad = self.max_prompt - l
        e = np.pad(e, ((0, pad), (0, 0)))
        m = np.pad(m.astype(np.int32), (0, pad))
        uid = self._next_uid
        self._next_uid += 1
        req = ServedRequest(uid, e, m)
        self.requests[uid] = req
        self.queue.append(req)
        return uid

    def _refill(self):
        for slot in range(self.slots):
            if self.slot_req[slot] is not None or not self.queue:
                continue
            req = self.queue.popleft()
            key = jax.random.fold_in(self.rng, req.uid)
            rows, tok0, nv = self._prefill(
                self.params, self.lora, jnp.asarray(req.embeds[None]),
                jnp.asarray(req.mask[None]), key)
            (self.caches, self.tok, self.n_fed, self.n_valid,
             self.base_mask, self.req_key) = self._insert(
                rows, self.caches, self.tok, self.n_fed, self.n_valid,
                self.base_mask, self.req_key, tok0, nv,
                jnp.asarray(req.mask[None]),
                jax.random.key_data(key) if hasattr(jax.random, "key_data")
                else key, jnp.int32(slot))
            self.slot_req[slot] = req.uid
            self._fed_host[slot] = 0

    def _retire(self, slot: int):
        req = self.requests[self.slot_req[slot]]
        req.finished = True
        self.slot_req[slot] = None

    def step(self) -> List[ServedRequest]:
        """One scheduler iteration: refill free slots from the queue, run
        ``steps_per_sync`` decode steps, record fed tokens, retire
        finished slots. Returns requests that finished this iteration."""
        self._refill()
        if all(r is None for r in self.slot_req):
            return []
        (self.caches, self.tok, self.n_fed, fed) = self._decode(
            self.params, self.caches, self.lora, self.tok, self.n_fed,
            self.n_valid, self.base_mask, self.req_key, self.steps_per_sync)
        fed = np.asarray(fed)                      # [steps_per_sync, B]
        finished = []
        for slot, uid in enumerate(self.slot_req):
            if uid is None:
                continue
            req = self.requests[uid]
            for s in range(fed.shape[0]):
                if self._fed_host[slot] >= self.max_new or req.done:
                    break                          # post-retire garbage
                t = int(fed[s, slot])
                req.tokens.append(t)
                req.valid.append(not req.done)
                self._fed_host[slot] += 1
                if t == self.eos_id:
                    req.done = True
            if req.done or self._fed_host[slot] >= self.max_new:
                self._retire(slot)
                finished.append(req)
        return finished

    @property
    def has_work(self) -> bool:
        return bool(self.queue) or any(r is not None for r in self.slot_req)

    def drain(self) -> List[ServedRequest]:
        out = []
        while self.has_work:
            out.extend(self.step())
        return out

    def run(self, requests) -> Dict[int, ServedRequest]:
        """Convenience: submit [(embeds, mask), ...] then drain. Returns
        uid -> ServedRequest in submission order (uids are sequential)."""
        for e, m in requests:
            self.submit(e, m)
        self.drain()
        return self.requests
