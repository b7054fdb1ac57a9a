"""Pipeline parallelism (GPipe schedule) for the OPT decoder stack.

The reference never pipelines (largest model, BLIP-2 OPT-2.7B, fits one
GPU — blip_2_training.py:187-206). For serving/scaling beyond one chip's
HBM the TPU-native option set is TP (parallel/tp.py: intra-layer, cheap
all-reduces every layer) and THIS: inter-layer pipelining over mesh axis
'pipe' — each chip holds L/S contiguous decoder layers, activations hop
stage-to-stage over ICI via ``lax.ppermute``, and M microbatches keep all
stages busy (utilization M/(M+S-1), the GPipe bubble).

Written as ``jax.shard_map`` over the mesh: per-device code scans its
LOCAL layer stack (params arrive stage-stacked, leading dim sharded over
'pipe'), and one collective-permute per tick moves the [mb, L, H]
activation to the next stage. Composes with dp on a second mesh axis
(batch dim sharded) because every collective here names only 'pipe'.

Parity contract: pp_decode_hidden == opt.decode_hidden bit-close for any
S dividing the layer count and any M dividing the batch
(tests/test_pp.py).

TRAINING: the whole pipeline is differentiable — `lax.scan` and
`lax.ppermute` transpose cleanly, so `jax.grad` of a loss through
`pp_decode_hidden` IS the GPipe backward (activations hop back
stage-to-stage in reverse; each chip accumulates grads only for its
local layers). `pp_lm_loss` + `make_pp_train_step` package that into a
causal-LM train step (full fine-tune or LoRA-only, the reference's
BLIP-2 recipe blip_2_training.py:210-229), with `remat=True` trading
recompute for activation memory via `jax.checkpoint` on the layer body.
GPipe with exact microbatch accumulation is mathematically identical to
single-device large-batch training — asserted in tests/test_pp_train.py.

Generation supports stage-stacked LoRA too (`pp_generate(stage_lora=...)`)
so pipe-trained adapters eval/serve through the mesh they trained on;
sampled decoding stays on the dp/tp paths (opt.generate's sampler).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PIPE_AXIS = "pipe"


def stack_pipeline_params(layers, n_stages: int):
    """[L] list of per-layer param dicts -> one pytree with leading dims
    [S, L/S] (stage-major), ready to shard dim0 over 'pipe'."""
    n = len(layers)
    if n % n_stages != 0:
        raise ValueError(f"{n} layers not divisible by {n_stages} stages")
    per = n // n_stages
    stages = []
    for s in range(n_stages):
        chunk = layers[s * per:(s + 1) * per]
        stages.append(jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *chunk))
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stages)


def shard_pipeline_params(mesh: Mesh, stacked, axis: str = PIPE_AXIS):
    """Place stage-stacked layer params: stage dim sharded over 'pipe'."""
    s = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda l: jax.device_put(l, s), stacked)


def stack_pipeline_lora(lora, n_layers: int, n_stages: int):
    """LoRA adapters (string-keyed per layer, blip2.init_lora layout) ->
    stage-stacked pytree with leading [S, L/S] dims, ready to shard dim0
    over 'pipe' alongside stack_pipeline_params output.

    Requires an adapter for EVERY layer with a uniform structure (the
    pipelined scan slices a dense stack; blip2.init_lora satisfies this)."""
    missing = [i for i in range(n_layers) if lora.get(str(i)) is None]
    if missing:
        raise ValueError(
            f"pipelined LoRA needs an adapter for every layer; missing "
            f"string keys {missing[:4]}{'...' if len(missing) > 4 else ''} "
            "(sparse adapters only run on the dp/tp paths)")
    want = jax.tree_util.tree_structure(lora["0"])
    for i in range(1, n_layers):
        got = jax.tree_util.tree_structure(lora[str(i)])
        if got != want:
            raise ValueError(
                f"pipelined LoRA needs a uniform adapter structure; layer "
                f"{i} has {got} but layer 0 has {want} (per-layer "
                "structures only run on the dp/tp paths)")
    return stack_pipeline_params([lora[str(i)] for i in range(n_layers)],
                                 n_stages)


def unstack_pipeline_params(stacked):
    """Inverse of stack_pipeline_params: [S, L/S, ...]-stacked pytree ->
    flat [L] list of per-layer trees. For checkpoint boundaries (BEST
    adapters are saved in the portable per-layer form so the dp/tp eval
    CLIs can load them)."""
    lead = jax.tree_util.tree_leaves(stacked)[0].shape[:2]
    s, per = int(lead[0]), int(lead[1])
    return [jax.tree_util.tree_map(lambda x: x[i][j], stacked)
            for i in range(s) for j in range(per)]


def unstack_pipeline_lora(stacked):
    """Inverse of stack_pipeline_lora: back to the string-keyed per-layer
    dict (orbax-safe keys — see blip2.init_lora's string-key note)."""
    return {str(i): l for i, l in enumerate(unstack_pipeline_params(stacked))}


def pp_decode_hidden(params, stage_layers, inputs_embeds, attention_mask,
                     cfg, mesh: Mesh, n_microbatches: int,
                     axis: str = PIPE_AXIS, train: bool = False,
                     stage_lora=None, lora_scale: float = 1.0,
                     remat: bool = False):
    """Pipelined twin of models/vlm/opt.decode_hidden (opt.py:126-135).

    params: the OPT params dict (embeddings + final_ln used here; its
    "layers" list is ignored in favor of `stage_layers`).
    stage_layers: stack_pipeline_params output, placed via
    shard_pipeline_params (leading [S] dim sharded over `axis`).
    inputs_embeds [B, L, H], attention_mask [B, L]; B % n_microbatches == 0.
    stage_lora: optional stack_pipeline_lora output (same sharding as
    stage_layers) — q/k low-rank updates applied inside every layer,
    exactly as the single-device path (opt._apply_lora).
    remat=True wraps the per-layer body in jax.checkpoint so the GPipe
    backward recomputes layer internals instead of storing them — the
    standard activation-memory trade for pipelined TRAINING.
    """
    from ..models.vlm.opt import _layer, prompt_prologue
    from ..nn import core as nn

    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_stages = sizes[axis]
    # dp composition: when the mesh carries a 'data' axis, each microbatch's
    # sample dim is sharded over it — every collective below names only
    # `axis`, so the pipeline runs independently per data shard
    dp_axis = "data" if ("data" in sizes and "data" != axis) else None
    n_dp = sizes.get(dp_axis, 1) if dp_axis else 1
    b, l, d = inputs_embeds.shape
    m = n_microbatches
    if b % m != 0:
        raise ValueError(f"batch {b} not divisible by {m} microbatches")
    mb = b // m
    if mb % n_dp != 0:
        raise ValueError(
            f"microbatch size {mb} not divisible by data-axis size {n_dp}")

    # embeddings + masks once, outside the pipeline (cheap, replicated);
    # position/bias convention shared with the single-device path
    h, mask, bias = prompt_prologue(params, inputs_embeds, attention_mask,
                                    cfg)

    # microbatch-major stacks [M, mb, ...]
    h_mb = h.reshape(m, mb, l, d)
    bias_mb = bias.reshape(m, mb, 1, l, l)
    mask_mb = mask.reshape(m, mb, l)

    fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def per_device(local_layers, local_lora, h_all, bias_all, mask_all):
        # local_layers leading dims [1, L/S] (this device's stage);
        # h_all [M, mb/n_dp, l, d] — the LOCAL slice when dp-sharded
        local_layers = jax.tree_util.tree_map(
            lambda x: x[0], local_layers)
        local_lora = jax.tree_util.tree_map(lambda x: x[0], local_lora)
        s = jax.lax.axis_index(axis)
        mb_loc = h_all.shape[1]

        def stage_fn(hcur, bias_t, mask_t):
            def body(hc, xs):
                lp, ll = xs
                return _layer(lp, hc, bias_t, cfg, ll, lora_scale,
                              mask=mask_t, train=train), None
            if remat:
                body = jax.checkpoint(body)
            out, _ = jax.lax.scan(body, hcur, (local_layers, local_lora))
            return out

        def tick(carry, t):
            state, outputs = carry
            mb_idx = t - s                      # this stage's microbatch
            safe = jnp.clip(mb_idx, 0, m - 1)
            x_in = jnp.where(
                s == 0,
                jax.lax.dynamic_index_in_dim(
                    h_all, jnp.clip(t, 0, m - 1), keepdims=False),
                state)
            h_out = stage_fn(
                x_in,
                jax.lax.dynamic_index_in_dim(bias_all, safe, keepdims=False),
                jax.lax.dynamic_index_in_dim(mask_all, safe, keepdims=False))
            valid = ((s == n_stages - 1) & (mb_idx >= 0) & (mb_idx < m)
                     ).astype(h_out.dtype)
            prev = jax.lax.dynamic_index_in_dim(outputs, safe,
                                                keepdims=False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, valid * h_out + (1 - valid) * prev, safe, 0)
            state = jax.lax.ppermute(h_out, axis, fwd)
            return (state, outputs), None

        zeros_state = jnp.zeros((mb_loc, l, d), h_all.dtype)
        zeros_out = jnp.zeros((m, mb_loc, l, d), h_all.dtype)
        (_, outputs), _ = jax.lax.scan(
            tick, (zeros_state, zeros_out), jnp.arange(m + n_stages - 1))
        # only the last stage holds real outputs; replicate via psum
        outputs = jax.lax.psum(
            jnp.where(s == n_stages - 1, outputs, 0.0), axis)
        return outputs

    dp = P(None, dp_axis) if dp_axis else P()
    specs_in = (P(axis), P(axis), dp, dp, dp)
    out = jax.shard_map(per_device, mesh=mesh, in_specs=specs_in,
                        out_specs=dp, check_vma=False)(
        stage_layers, stage_lora, h_mb, bias_mb, mask_mb)
    out = out.reshape(b, l, d)
    return nn.layernorm(params["final_ln"], out, eps=cfg.ln_eps)


def pp_decode(params, stage_layers, inputs_embeds, attention_mask, cfg,
              mesh: Mesh, n_microbatches: int, axis: str = PIPE_AXIS,
              stage_lora=None, lora_scale: float = 1.0):
    """Pipelined twin of opt.decode: final hidden -> tied-embedding
    logits. stage_lora (stack_pipeline_lora output) evaluates a
    LoRA-tuned model through the same pipeline it trained on."""
    from ..models.vlm.opt import lm_head

    h = pp_decode_hidden(params, stage_layers, inputs_embeds,
                         attention_mask, cfg, mesh, n_microbatches, axis,
                         stage_lora=stage_lora, lora_scale=lora_scale)
    return lm_head(params, h)


def pp_lm_loss(params, stage_layers, inputs_embeds, attention_mask, labels,
               cfg, mesh: Mesh, n_microbatches: int, axis: str = PIPE_AXIS,
               stage_lora=None, lora_scale: float = 1.0,
               remat: bool = False):
    """Causal-LM CE through the pipelined forward — the same shifted
    next-token loss as blip2.lm_loss (blip2.py:126-145, the reference's
    BLIP-2 objective blip_2_training.py:280-293): positions with
    label -100 are ignored, mean over the valid rest.

    `labels` [B, L] align with the FULL input sequence (for BLIP-2 use,
    mark the query segment and pads -100, as the reference collate does).
    params needs only embed_tokens / embed_positions / final_ln.
    """
    h = pp_decode_hidden(params, stage_layers, inputs_embeds,
                         attention_mask, cfg, mesh, n_microbatches, axis,
                         train=True, stage_lora=stage_lora,
                         lora_scale=lora_scale, remat=remat)
    from ..models.vlm.opt import lm_head, shifted_ce
    return shifted_ce(lm_head(params, h), labels)


def make_pp_train_step(tx, cfg, mesh: Mesh, n_microbatches: int,
                       axis: str = PIPE_AXIS, lora_scale: float = 1.0,
                       remat: bool = True):
    """Build the jitted GPipe train step.

    Returns step(trainable, frozen, opt_state, batch) ->
    (trainable, opt_state, loss). `trainable`/`frozen` together supply
    {"head": {embed_tokens, embed_positions, final_ln},
     "stages": stack_pipeline_params output,
     "lora": stack_pipeline_lora output (optional)} — put each group in
    whichever dict matches the recipe:
      full fine-tune: trainable={"head", "stages"}, frozen={}
      LoRA (the reference BLIP-2 recipe): trainable={"lora"},
        frozen={"head", "stages"}  (base weights never touched, adapter
        grads are tiny — the GPipe backward still streams activations
        stage-to-stage but materializes no base-weight grads).

    The backward is jax.grad through the pipelined scan/ppermute forward:
    activations hop back in reverse stage order, every chip computes
    grads only for its local [L/S] layer slice, exactly GPipe. GPipe
    microbatch accumulation is exact, so grads/updates equal
    single-device large-batch training to fp reduction-order noise
    (tests/test_pp_train.py). trainable and opt_state buffers are
    donated — re-bind them, don't reuse the arguments after a step.
    """
    import optax

    def loss_fn(trainable, frozen, batch):
        full = {**frozen, **trainable}
        return pp_lm_loss(full["head"], full["stages"],
                          batch["inputs_embeds"], batch["attention_mask"],
                          batch["labels"], cfg, mesh, n_microbatches, axis,
                          stage_lora=full.get("lora"),
                          lora_scale=lora_scale, remat=remat)

    @partial(jax.jit, donate_argnums=(0, 2))
    def step(trainable, frozen, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(trainable, frozen, batch)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss

    return step


def pp_blip2_lm_loss(params, stage_layers, stage_lora, pixel_values,
                     input_ids, attention_mask, labels, cfg, mesh: Mesh,
                     n_microbatches: int, axis: str = PIPE_AXIS,
                     remat: bool = False):
    """Pipelined twin of blip2.lm_loss (blip2.py:126-137) — the
    reference's BLIP-2 LoRA objective (blip_2_training.py:280-293) with
    the OPT tower GPipe-pipelined: the frozen EVA-ViT + Q-Former +
    projection forward runs replicated (dp-sharded over a 'data' mesh
    axis when present), its query embeddings prepend the token
    embeddings exactly like blip2._lm_hidden, and the combined sequence
    streams through the stage-sharded decoder with stage-stacked LoRA
    adapters. Text-segment shifted CE via opt.shifted_ce — same -100
    semantics as the single-device path (tests/test_pp_train.py asserts
    loss AND lora-grad parity)."""
    from ..models.vlm import blip2 as b2
    from ..models.vlm.opt import lm_head, shifted_ce

    embeds, mask = b2.prompt_embeds(params, pixel_values, input_ids,
                                    attention_mask, cfg)
    h = pp_decode_hidden(params["opt"], stage_layers, embeds, mask,
                         cfg.opt, mesh, n_microbatches, axis, train=True,
                         stage_lora=stage_lora, lora_scale=cfg.lora_scale,
                         remat=remat)
    logits = lm_head(params["opt"], h)
    return shifted_ce(logits[:, cfg.qformer.n_query:, :], labels)


def make_pp_blip2_train_step(tx, cfg, mesh: Mesh, n_microbatches: int,
                             axis: str = PIPE_AXIS, remat: bool = True):
    """The reference BLIP-2 recipe (LoRA-only training, AdamW
    blip_2_training.py:210-229) over a dp x pipe mesh: base weights
    frozen (vision/Q-Former replicated, decoder stage-sharded), only the
    stage-stacked adapters update. Returns
    step(stage_lora, opt_state, params, stage_layers, batch) ->
    (stage_lora, opt_state, loss); batch carries pixel_values /
    input_ids / attention_mask / labels. stage_lora and opt_state are
    donated — re-bind, don't reuse the arguments."""
    import optax

    def loss_fn(stage_lora, params, stage_layers, batch):
        return pp_blip2_lm_loss(params, stage_layers, stage_lora,
                                batch["pixel_values"], batch["input_ids"],
                                batch["attention_mask"], batch["labels"],
                                cfg, mesh, n_microbatches, axis, remat)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(stage_lora, opt_state, params, stage_layers, batch):
        loss, grads = jax.value_and_grad(loss_fn)(stage_lora, params,
                                                  stage_layers, batch)
        updates, opt_state = tx.update(grads, opt_state, stage_lora)
        return optax.apply_updates(stage_lora, updates), opt_state, loss

    return step


def pp_generate(params, stage_layers, inputs_embeds, attention_mask, cfg,
                mesh: Mesh, max_new_tokens: int, eos_id: int = 2,
                axis: str = PIPE_AXIS, cache_dtype=None,
                stage_lora=None, lora_scale: float = 1.0):
    """Pipelined greedy KV-cache generation — the pp twin of the serving
    path (models/vlm/opt.py prefill + decode_step; semantics of
    blip2.generate's token loop, blip2.py:167-226).

    GPipe ring schedule: the batch splits into S microbatches (S = the
    'pipe' axis size), each stage holds K/V caches for its L/S local
    layers x all S microbatches, and per-token hidden states hop
    stage-to-stage over ICI via ``lax.ppermute``. Greedy decoding is
    sequential per sequence — token t+1 needs token t's logits from the
    LAST stage — so single-batch pp decode would idle S-1 of S stages;
    the ring keeps all stages busy by rotating the S microbatches: while
    microbatch 0's token is in stage 2, microbatch 1's is in stage 1 and
    microbatch 2's sampled embedding is wrapping from the last stage back
    to stage 0. Steady-state utilization S·N/(S·N + S - 1).

    Two scans: (1) prefill — each microbatch's full prompt streams
    through the stages once, filling caches; the last stage samples token
    0 and its embedding wraps to stage 0, which buffers it until that
    microbatch's decode slot comes up; (2) decode ring — S·N + S - 1
    ticks of one-token stage steps. Static shapes throughout.

    Composes with dp exactly like pp_decode_hidden (sample dim sharded
    over a 'data' mesh axis when present). stage_lora (the
    stack_pipeline_lora layout, stage dim sharded like stage_layers)
    applies q/k low-rank updates inside every prefill and decode layer —
    token streams match opt.generate with the same per-layer adapters
    exactly (tests/test_pp.py), so a pipe-trained LoRA model evals
    through the mesh it trained on. Sampling stays unsupported (for
    sampled decoding use opt.generate's sampler on the dp/tp paths).

    Returns (tokens [B, max_new_tokens] int32, valid [B, max_new_tokens]
    bool) — identical contract to blip2.generate: each row's EOS token is
    its last valid entry, ``valid`` False strictly after it.

    cache_dtype="int8" quantizes each stage's K/V caches (ops/quant.py,
    same per-slot scheme as opt.generate — token streams match the
    single-device int8 path exactly). pp is where this bites hardest:
    every stage holds caches for all S microbatches, so the per-chip
    cache footprint equals the whole single-device cache.
    """
    from ..models.vlm.opt import (layer_decode, layer_decode_q,
                                  layer_prefill, prompt_prologue)
    from ..nn import core as nn
    from ..ops import quant

    if cache_dtype not in (None, "int8"):
        raise ValueError(f"unknown cache_dtype {cache_dtype!r} "
                         "(None or 'int8')")
    quantized = cache_dtype == "int8"

    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_stages = sizes[axis]
    dp_axis = "data" if ("data" in sizes and "data" != axis) else None
    n_dp = sizes.get(dp_axis, 1) if dp_axis else 1
    b, lp_len, d = inputs_embeds.shape
    s_ = n_stages
    n_new = max_new_tokens
    if b % s_ != 0:
        raise ValueError(f"batch {b} not divisible by {s_} pipeline "
                         "microbatches (pp_generate uses one microbatch "
                         "per stage)")
    mb = b // s_
    if mb % n_dp != 0:
        raise ValueError(
            f"microbatch size {mb} not divisible by data-axis size {n_dp}")
    t_cache = lp_len + n_new

    # prompt-side tensors, microbatch-major [S, mb, ...] (outside the
    # pipeline: embeddings, masks and gather indices are cheap);
    # position/bias convention shared with the single-device path
    h, mask, bias = prompt_prologue(params, inputs_embeds, attention_mask,
                                    cfg)
    neg = jnp.finfo(jnp.float32).min
    n_valid = jnp.sum(mask, axis=1)
    last_idx = jnp.argmax(mask * jnp.arange(1, lp_len + 1)[None, :], axis=1)

    h_mb = h.reshape(s_, mb, lp_len, d)
    bias_mb = bias.reshape(s_, mb, 1, lp_len, lp_len)
    basemask_mb = jnp.pad(mask, ((0, 0), (0, n_new))).reshape(s_, mb, t_cache)
    nvalid_mb = n_valid.reshape(s_, mb)
    last_mb = last_idx.reshape(s_, mb)

    emb_w = params["embed_tokens"]["w"]
    pos_w = params["embed_positions"]["w"]
    fln = params["final_ln"]
    dtype = inputs_embeds.dtype

    def per_device(local_layers, local_lora, h_all, bias_all, bmask_all,
                   nvalid_all, last_all, emb_w, pos_w, fln):
        local_layers = jax.tree_util.tree_map(lambda x: x[0], local_layers)
        local_lora = jax.tree_util.tree_map(lambda x: x[0], local_lora)
        n_loc = jax.tree_util.tree_leaves(local_layers)[0].shape[0]
        s = jax.lax.axis_index(axis)
        mb_loc = h_all.shape[1]
        slots = jnp.arange(t_cache)

        def sample(h_vec):
            """post-stack hidden [mb, H] -> (next token ids, raw embeds)."""
            hf = nn.layernorm(fln, h_vec, eps=cfg.ln_eps)
            logits = (hf @ emb_w.astype(hf.dtype).T).astype(jnp.float32)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return nxt, emb_w[nxt].astype(dtype)

        if quantized:
            caches0 = {
                "k": jnp.zeros((n_loc, s_, mb_loc, t_cache, d), jnp.int8),
                "k_scale": jnp.ones((n_loc, s_, mb_loc, t_cache, 1),
                                    jnp.float32),
                "v": jnp.zeros((n_loc, s_, mb_loc, t_cache, d), jnp.int8),
                "v_scale": jnp.ones((n_loc, s_, mb_loc, t_cache, 1),
                                    jnp.float32),
            }
        else:
            caches0 = {
                "k": jnp.zeros((n_loc, s_, mb_loc, t_cache, d), dtype),
                "v": jnp.zeros((n_loc, s_, mb_loc, t_cache, d), dtype),
            }

        # ---- scan 1: pipelined prefill (ticks 0 .. 2S-1) ----
        def prefill_tick(carry, t):
            blk, wire, caches, buf, tok_cur = carry
            phase = t - s
            active = (phase >= 0) & (phase < s_)
            mi = jnp.clip(phase, 0, s_ - 1)
            # stage 0 buffers the token-0 embedding wrapping in from the
            # last stage (arrives at ticks S .. 2S-1 for microbatches
            # 0 .. S-1)
            cap = jnp.clip(t - s_, 0, s_ - 1)
            buf_new = jax.lax.dynamic_update_index_in_dim(
                buf, wire, cap, 0)
            buf = jnp.where((s == 0) & (t >= s_), buf_new, buf)

            x = jnp.where(s == 0,
                          jax.lax.dynamic_index_in_dim(h_all, mi, 0, False),
                          blk)
            bi = jax.lax.dynamic_index_in_dim(bias_all, mi, 0, False)

            def lyr(hc, xs):
                lp, ll = xs
                hc, k, v = layer_prefill(lp, hc, bi, cfg, lora=ll,
                                         lora_scale=lora_scale)
                return hc, (k, v)

            h_out, (ks, vs) = jax.lax.scan(lyr, x,
                                           (local_layers, local_lora))
            kp = jnp.pad(ks, ((0, 0), (0, 0), (0, n_new), (0, 0)))
            vp = jnp.pad(vs, ((0, 0), (0, 0), (0, n_new), (0, 0)))
            if quantized:
                kq, ksc = quant.quantize_rows(kp)
                vq, vsc = quant.quantize_rows(vp)
                blk_pad = {"k": kq, "k_scale": ksc, "v": vq, "v_scale": vsc}
            else:
                blk_pad = {"k": kp, "v": vp}
            # gate on the SLICE, then update unconditionally: a
            # where(active, dus(cache), cache) would select (= copy) the
            # whole per-stage cache every tick
            caches = jax.tree_util.tree_map(
                lambda c, blkv: jax.lax.dynamic_update_slice(
                    c,
                    jnp.where(active, blkv.astype(c.dtype),
                              jax.lax.dynamic_index_in_dim(c, mi, 1, False)
                              )[:, None],
                    (0, mi, 0, 0, 0)),
                caches, blk_pad)

            li = jax.lax.dynamic_index_in_dim(last_all, mi, 0, False)
            h_last = h_out[jnp.arange(mb_loc), li]
            tok0, emb0 = sample(h_last)
            is_last = active & (s == s_ - 1)
            tok_cur = jnp.where(
                is_last,
                jax.lax.dynamic_update_index_in_dim(tok_cur, tok0, mi, 0),
                tok_cur)
            wire_out = jnp.where(s == s_ - 1, emb0, wire)
            blk = jax.lax.ppermute(h_out, axis, fwd)
            wire = jax.lax.ppermute(wire_out, axis, fwd)
            return (blk, wire, caches, buf, tok_cur), None

        zeros_blk = jnp.zeros((mb_loc, lp_len, d), dtype)
        zeros_tok = jnp.zeros((mb_loc, d), dtype)
        carry0 = (zeros_blk, zeros_tok, caches0,
                  jnp.zeros((s_, mb_loc, d), dtype),
                  jnp.zeros((s_, mb_loc), jnp.int32))
        (_, _, caches, buf, tok_cur), _ = jax.lax.scan(
            prefill_tick, carry0, jnp.arange(2 * s_))

        # ---- scan 2: decode ring (ticks 0 .. S·N + S - 2) ----
        def decode_tick(carry, t):
            wire, caches, tok_cur, done, out_t, out_v = carry
            phase = t - s
            active = (phase >= 0) & (phase < s_ * n_new)
            sp = jnp.clip(phase, 0, s_ * n_new - 1)
            mi = sp % s_
            ti = sp // s_                       # decode round / token index
            x = jnp.where((s == 0) & (ti == 0),
                          jax.lax.dynamic_index_in_dim(buf, mi, 0, False),
                          wire)
            nv = jax.lax.dynamic_index_in_dim(nvalid_all, mi, 0, False)
            pos = nv + ti + cfg.pos_offset
            h_in = x + jnp.where(s == 0,
                                 nn.embedding({"w": pos_w}, pos
                                              ).astype(dtype), 0)
            slot = lp_len + ti
            bm = jax.lax.dynamic_index_in_dim(bmask_all, mi, 0, False)
            attn = bm | ((slots >= lp_len) & (slots <= slot)).astype(bm.dtype)
            bi = ((1.0 - attn.astype(jnp.float32))
                  * neg)[:, None, None, :]
            widx = jnp.full((mb_loc,), slot, jnp.int32)
            cur = {k: jax.lax.dynamic_index_in_dim(c, mi, 1, False)
                   for k, c in caches.items()}

            if quantized:
                def lyr(hc, xs):
                    lp, ll, ckq, cks, cvq, cvs = xs
                    hc, ckq, cks, cvq, cvs = layer_decode_q(
                        lp, hc, ckq, cks, cvq, cvs, widx, bi, cfg,
                        lora=ll, lora_scale=lora_scale)
                    return hc, {"k": ckq, "k_scale": cks,
                                "v": cvq, "v_scale": cvs}

                h_out, new = jax.lax.scan(
                    lyr, h_in, (local_layers, local_lora, cur["k"],
                                cur["k_scale"], cur["v"], cur["v_scale"]))
            else:
                def lyr(hc, xs):
                    lp, ll, ckl, cvl = xs
                    hc, ckl, cvl = layer_decode(lp, hc, ckl, cvl, widx,
                                                bi, cfg, lora=ll,
                                                lora_scale=lora_scale)
                    return hc, {"k": ckl, "v": cvl}

                h_out, new = jax.lax.scan(
                    lyr, h_in, (local_layers, local_lora, cur["k"],
                                cur["v"]))
            # slice-gated write (see prefill_tick): never select on the
            # full cache buffer
            caches = {
                k: jax.lax.dynamic_update_slice(
                    caches[k], jnp.where(active, new[k], cur[k])[:, None],
                    (0, mi, 0, 0, 0))
                for k in caches}

            nxt, emb = sample(h_out)
            is_last = active & (s == s_ - 1)
            cur = jax.lax.dynamic_index_in_dim(tok_cur, mi, 0, False)
            dn = jax.lax.dynamic_index_in_dim(done, mi, 0, False)
            out_t = jnp.where(is_last, jax.lax.dynamic_update_slice(
                out_t, cur[None, :, None], (mi, 0, ti)), out_t)
            out_v = jnp.where(is_last, jax.lax.dynamic_update_slice(
                out_v, (~dn)[None, :, None], (mi, 0, ti)), out_v)
            done = jnp.where(is_last, jax.lax.dynamic_update_index_in_dim(
                done, dn | (cur == eos_id), mi, 0), done)
            tok_cur = jnp.where(is_last, jax.lax.dynamic_update_index_in_dim(
                tok_cur, nxt, mi, 0), tok_cur)
            wire = jax.lax.ppermute(jnp.where(s == s_ - 1, emb, h_out),
                                    axis, fwd)
            return (wire, caches, tok_cur, done, out_t, out_v), None

        carry1 = (zeros_tok, caches, tok_cur,
                  jnp.zeros((s_, mb_loc), bool),
                  jnp.zeros((s_, mb_loc, n_new), jnp.int32),
                  jnp.zeros((s_, mb_loc, n_new), bool))
        (_, _, _, _, out_t, out_v), _ = jax.lax.scan(
            decode_tick, carry1, jnp.arange(s_ * n_new + s_ - 1))

        # outputs live on the last stage only; replicate over 'pipe'
        out_t = jax.lax.psum(jnp.where(s == s_ - 1, out_t, 0), axis)
        out_v = jax.lax.psum(
            jnp.where(s == s_ - 1, out_v, False).astype(jnp.int32), axis)
        return out_t, out_v

    fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    dp = P(None, dp_axis) if dp_axis else P()
    dp3 = P(None, dp_axis, None) if dp_axis else P()
    toks, valid = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(axis), P(axis), dp, dp, dp, dp, dp, P(), P(), P()),
        out_specs=(dp3, dp3), check_vma=False)(
        stage_layers, stage_lora, h_mb, bias_mb, basemask_mb, nvalid_mb,
        last_mb, emb_w, pos_w, fln)
    return toks.reshape(b, n_new), valid.reshape(b, n_new).astype(bool)
