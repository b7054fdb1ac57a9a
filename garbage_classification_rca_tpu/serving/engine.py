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
grid of B slots (plus one scratch lane) with STATIC [layers, B+1, T, H]
KV caches, and two jitted programs with static shapes —

  * _prefill_insert: a FULL batch of up to B prompts (padded to
    max_prompt) -> cache rows + first sampled tokens, scattered into
    their slots at TRACED indices (no per-slot recompiles; padding rows
    scatter into the scratch lane, so every refill — 1 request or B —
    runs the SAME executable and reads the weights once). Reuses
    opt.prefill, so the fused-MHA prefill path and int8 cache
    quantization apply unchanged; per-request sampling keys are derived
    on device (fold_in(rng, uid)).
  * _decode: ``steps_per_sync`` batched one-token steps (lax.scan over
    opt.decode_step) for ALL slots at once, with PER-SLOT progress:
    every lane carries its own write offset, learned-position index and
    attention extent, so slot 3 can be on its 14th token while slot 4 is
    on its 1st. Returns the fed tokens; the host loop retires finished
    slots (EOS fed or its own max_new budget reached) and immediately
    refills them from the queue.

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
    max_new: int = 0            # this request's token budget (<= server's)
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

        # device state: one lane per slot, plus ONE scratch lane (index
        # ``slots``) so the batched prefill program always runs at a FIXED
        # batch (compile once) — refills with fewer than ``slots`` queued
        # requests pad the batch with duplicate rows scattered into the
        # scratch lane. The decode program carries the extra lane too:
        # decode is weight-read-bound, so one garbage lane is ~free, and
        # the scheduler never assigns it.
        lanes = slots + 1
        n_layers = len(params["layers"])
        h = cfg.hidden
        if cache_dtype == "int8":
            self.caches = {
                "k": jnp.zeros((n_layers, lanes, self.t_cache, h), jnp.int8),
                "k_scale": jnp.ones((n_layers, lanes, self.t_cache, 1),
                                    jnp.float32),
                "v": jnp.zeros((n_layers, lanes, self.t_cache, h), jnp.int8),
                "v_scale": jnp.ones((n_layers, lanes, self.t_cache, 1),
                                    jnp.float32),
            }
        else:
            cdtype = jax.tree_util.tree_leaves(params)[0].dtype
            self.caches = {
                "k": jnp.zeros((n_layers, lanes, self.t_cache, h), cdtype),
                "v": jnp.zeros((n_layers, lanes, self.t_cache, h), cdtype),
            }
        self.tok = jnp.zeros((lanes,), jnp.int32)
        self.n_fed = jnp.zeros((lanes,), jnp.int32)
        self.n_valid = jnp.zeros((lanes,), jnp.int32)
        self.base_mask = jnp.zeros((lanes, self.t_cache), jnp.int32)
        self.req_key = jnp.zeros((lanes, 2), jnp.uint32)
        self._fed_host = np.zeros((slots,), np.int64)  # host mirror of n_fed

        self._emb_dtype = params["embed_tokens"]["w"].dtype
        self._prefill_insert = jax.jit(self._prefill_insert_impl,
                                       donate_argnums=(2, 3, 4, 5, 6, 7))
        self._decode = jax.jit(self._decode_impl, donate_argnums=(1,),
                               static_argnums=(8,))

    # ---- jitted programs -------------------------------------------------

    def _prefill_insert_impl(self, params, lora, caches, tok_state,
                             nfed_state, nvalid_state, bmask_state,
                             key_state, embeds, mask, rng, uids, slots_vec):
        """Prefill a FULL batch of ``slots`` prompts and scatter each
        row's cache + lane state into its slot (traced indices) — one
        program, one weight read, for up to ``slots`` refills. Padding
        rows carry slots_vec == the scratch lane; duplicate scratch
        writes clobber each other harmlessly.

        Per-row results are bitwise equal to a B=1 prefill: the batch
        axis is a parallel map in every contraction (attention reduces
        over seq, matmuls over hidden), so batching does not change any
        row's reduction order.
        """
        m = mask.astype(jnp.int32)
        h, rows = opt_mod.prefill(params, embeds, m, self.cfg,
                                  self.max_new, lora=lora,
                                  lora_scale=self.lora_scale,
                                  cache_dtype=self.cache_dtype)
        last = jnp.argmax(m * jnp.arange(1, m.shape[1] + 1)[None, :], axis=1)
        h_last = h[jnp.arange(h.shape[0]), last]
        logits = opt_mod.lm_head(params, h_last)
        # per-request keys derived on device (fold_in(rng, uid) — the
        # documented standalone-reproduction key); no host round-trips
        keys = jax.vmap(jax.random.fold_in, (None, 0))(rng, uids)
        tok0 = jax.vmap(
            lambda k, lg: smp.sample_tokens(jax.random.fold_in(k, 0),
                                            lg[None], self.sampler)[0]
        )(keys, logits)
        raw = (jax.vmap(jax.random.key_data)(keys)
               if hasattr(jax.random, "key_data") else keys)
        caches = jax.tree_util.tree_map(
            lambda c, r: c.at[:, slots_vec].set(r.astype(c.dtype)),
            caches, rows)
        bmask = bmask_state.at[slots_vec].set(
            jnp.pad(m, ((0, 0), (0, self.max_new))))
        return (caches, tok_state.at[slots_vec].set(tok0),
                nfed_state.at[slots_vec].set(0),
                nvalid_state.at[slots_vec].set(jnp.sum(m, axis=1)),
                bmask, key_state.at[slots_vec].set(raw))

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
                                            attn, self.cfg, lora=lora,
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
        return caches, tok, n_fed, fed

    # ---- host scheduler --------------------------------------------------

    def submit(self, inputs_embeds, attention_mask,
               max_new: Optional[int] = None) -> int:
        """Queue one request. inputs_embeds [L, H] (or [1, L, H]) and
        attention_mask [L], L <= max_prompt, any padding side. ``max_new``
        caps THIS request's token budget (defaults to the server-wide
        max_new; must not exceed it — the KV grid is sized for it); a
        request retires at its own cap, freeing the slot early. Returns
        the request uid."""
        # device-resident embeddings (e.g. straight from the BLIP-2 vision
        # tower) stay on device — np.asarray would round-trip max_prompt*H
        # floats through the host per request
        on_device = isinstance(inputs_embeds, jax.Array)
        e = inputs_embeds if on_device else np.asarray(inputs_embeds)
        m = np.asarray(attention_mask)
        if e.ndim == 3:
            e, m = e[0], m.reshape(-1)
        l, h = e.shape
        if h != self.cfg.hidden:
            # fail at the API boundary: a wrong-width prompt inside the
            # batched refill would error mid-trace AFTER valid neighbors
            # were already dequeued
            raise ValueError(f"prompt hidden dim {h} != cfg.hidden "
                             f"{self.cfg.hidden}")
        if l > self.max_prompt:
            raise ValueError(f"prompt length {l} > max_prompt "
                             f"{self.max_prompt}")
        # pin the prompt dtype NOW (lazy for device arrays): refills stack
        # up to `slots` requests into one batch, and jnp.stack's dtype
        # promotion would otherwise make a request's prefill numerics —
        # and so its stream — depend on which neighbors share its refill.
        # The standalone oracle is opt.generate on the same-cast prompt
        # (prompt_embeds already produces this dtype).
        e = e.astype(self._emb_dtype)
        if max_new is None:
            max_new = self.max_new
        if not 1 <= max_new <= self.max_new:
            raise ValueError(f"max_new {max_new} not in [1, {self.max_new}]")
        pad = self.max_prompt - l
        e = (jnp.pad(e, ((0, pad), (0, 0))) if on_device
             else np.pad(e, ((0, pad), (0, 0))))
        m = np.pad(m.astype(np.int32), (0, pad))
        uid = self._next_uid
        self._next_uid += 1
        req = ServedRequest(uid, e, m, max_new)
        self.requests[uid] = req
        self.queue.append(req)
        return uid

    def _refill(self):
        """Prefill+insert every refillable slot in ONE batched program
        call (one weight read for up to ``slots`` refills); padding rows
        scatter into the scratch lane."""
        free = [s for s in range(self.slots) if self.slot_req[s] is None]
        if not free or not self.queue:
            return
        take = [self.queue.popleft()
                for _ in range(min(len(free), len(self.queue)))]
        pad = self.slots - len(take)
        slots_vec = np.asarray(free[:len(take)] + [self.slots] * pad,
                               np.int32)
        batch = take + [take[-1]] * pad
        embeds = jnp.stack([jnp.asarray(r.embeds) for r in batch])
        masks = np.stack([r.mask for r in batch])
        uids = np.asarray([r.uid for r in batch], np.int32)
        (self.caches, self.tok, self.n_fed, self.n_valid,
         self.base_mask, self.req_key) = self._prefill_insert(
            self.params, self.lora, self.caches, self.tok, self.n_fed,
            self.n_valid, self.base_mask, self.req_key, embeds,
            jnp.asarray(masks), self.rng, jnp.asarray(uids),
            jnp.asarray(slots_vec))
        for r, s in zip(take, slots_vec):
            self.slot_req[int(s)] = r.uid
            self._fed_host[int(s)] = 0

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
                if self._fed_host[slot] >= req.max_new or req.done:
                    break                          # post-retire garbage
                t = int(fed[s, slot])
                req.tokens.append(t)
                # the break above fires before any post-EOS append, so
                # every recorded token is valid (EOS inclusive) — kept as
                # a list to mirror opt.generate's (tokens, valid) shape
                req.valid.append(True)
                self._fed_host[slot] += 1
                if t == self.eos_id:
                    req.done = True
            if req.done or self._fed_host[slot] >= req.max_new:
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
