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
(tests/test_pp.py); LoRA adapters are intentionally unsupported here (the
serving path runs merged/base weights — adapters live on the dp/tp paths).
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


def pp_decode_hidden(params, stage_layers, inputs_embeds, attention_mask,
                     cfg, mesh: Mesh, n_microbatches: int,
                     axis: str = PIPE_AXIS, train: bool = False):
    """Pipelined twin of models/vlm/opt.decode_hidden (opt.py:96-113).

    params: the OPT params dict (embeddings + final_ln used here; its
    "layers" list is ignored in favor of `stage_layers`).
    stage_layers: stack_pipeline_params output, placed via
    shard_pipeline_params (leading [S] dim sharded over `axis`).
    inputs_embeds [B, L, H], attention_mask [B, L]; B % n_microbatches == 0.
    """
    from ..models.vlm.opt import _layer
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

    # embeddings + masks once, outside the pipeline (cheap, replicated)
    mask = attention_mask.astype(jnp.int32)
    positions = jnp.cumsum(mask, axis=1) * mask - 1 + cfg.pos_offset
    positions = jnp.clip(positions, 0, cfg.max_pos + cfg.pos_offset - 1)
    h = inputs_embeds + nn.embedding(params["embed_positions"], positions
                                     ).astype(inputs_embeds.dtype)
    causal = jnp.tril(jnp.ones((l, l), jnp.float32))[None, None]
    pad = mask.astype(jnp.float32)[:, None, None, :]
    bias = (1.0 - causal * pad) * jnp.finfo(jnp.float32).min

    # microbatch-major stacks [M, mb, ...]
    h_mb = h.reshape(m, mb, l, d)
    bias_mb = bias.reshape(m, mb, 1, l, l)
    mask_mb = mask.reshape(m, mb, l)

    fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def per_device(local_layers, h_all, bias_all, mask_all):
        # local_layers leading dims [1, L/S] (this device's stage);
        # h_all [M, mb/n_dp, l, d] — the LOCAL slice when dp-sharded
        local_layers = jax.tree_util.tree_map(
            lambda x: x[0], local_layers)
        s = jax.lax.axis_index(axis)
        mb_loc = h_all.shape[1]

        def stage_fn(hcur, bias_t, mask_t):
            def body(hc, lp):
                return _layer(lp, hc, bias_t, cfg, mask=mask_t,
                              train=train), None
            out, _ = jax.lax.scan(body, hcur, local_layers)
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
    specs_in = (P(axis), dp, dp, dp)
    out = jax.shard_map(per_device, mesh=mesh, in_specs=specs_in,
                        out_specs=dp, check_vma=False)(
        stage_layers, h_mb, bias_mb, mask_mb)
    out = out.reshape(b, l, d)
    return nn.layernorm(params["final_ln"], out, eps=cfg.ln_eps)


def pp_decode(params, stage_layers, inputs_embeds, attention_mask, cfg,
              mesh: Mesh, n_microbatches: int, axis: str = PIPE_AXIS):
    """Pipelined twin of opt.decode: final hidden -> tied-embedding logits."""
    from ..models.vlm.opt import lm_head

    h = pp_decode_hidden(params, stage_layers, inputs_embeds,
                         attention_mask, cfg, mesh, n_microbatches, axis)
    return lm_head(params, h)
