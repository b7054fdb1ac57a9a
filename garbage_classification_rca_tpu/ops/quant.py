"""Symmetric per-row int8 quantization for KV caches.

Serving-side memory optimization (no reference counterpart — the
reference never caches K/V at all; its eval decodes one token per
forward, blip_2_training.py:296-297). Decode attention is HBM-bound:
every step re-reads the whole [L, B, T, H] cache, so int8 storage cuts
that traffic 2x vs bf16 / 4x vs f32 and doubles-to-quadruples the
sequences a chip can hold. XLA fuses the int8->float convert+scale into
the attention matmul's operand read, so the dequant costs no extra HBM
round-trip.

Scheme: per-row (per cache slot, per layer) symmetric absmax — scale =
absmax/127 over the hidden dim, int8 mantissa, f32 scale [.., 1] riding
along (overhead 1/H). Zero rows (prefill's pre-allocated generation
slots) get scale 1 and quantize to exact zeros. Accuracy: relative
per-element error <= 1/254 * (absmax/|x|); attention scores average over
head_dim elements, shrinking the error another ~sqrt(head_dim) — the
tiny-model greedy token streams in tests/test_quant.py come out
identical to the fp cache.
"""

from __future__ import annotations

import jax.numpy as jnp


def quantize_rows(x, axis: int = -1):
    """x [..., H] -> (q int8 same shape, scale f32 with `axis` size 1)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.round(xf / scale).astype(jnp.int8)   # |xf/scale| <= 127 exactly
    return q, scale


def dequantize(q, scale, dtype):
    """Inverse of quantize_rows (up to rounding)."""
    return (q.astype(jnp.float32) * scale).astype(dtype)


# ---------------------------------------------------------------------------
# Weight-only int8 (serving decode path)
#
# Decode reads EVERY weight byte once per generated token (the cache read
# is small next to the 5.3 GB of bf16 OPT-2.7B matmul weights), so the
# step is weight-bandwidth-bound. Per-output-channel symmetric int8
# halves that traffic: nn.core.linear keeps the int8 tensor as the matmul
# operand (XLA fuses the convert into the operand load, same as the KV
# path above) and applies the f32 per-channel scale to the [.., out]
# activations AFTER the contraction — mathematically identical to
# dequantizing the weight first, but the HBM read is the int8 bytes.
#
# Opt-in, weights only: activations, embeddings (tied lm_head), biases,
# LayerNorms and LoRA adapters stay fp, so the only error source is the
# <= 1/254-relative weight rounding. No reference counterpart (the
# reference has no serving layer at all).
# ---------------------------------------------------------------------------

_OPT_LAYER_LINEARS = ("q", "k", "v", "out", "fc1", "fc2")


def quantize_linear(p):
    """Weight-only int8 for one nn.core linear param dict.

    w [in, out] -> int8 with a per-OUTPUT-channel absmax scale
    (f32 [1, out]); bias (if any) rides along untouched. Consumed
    transparently by nn.core.linear (it keys on the "w_scale" entry).
    """
    w = p["w"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = {"w": jnp.round(w / scale).astype(jnp.int8), "w_scale": scale}
    if "b" in p:
        q["b"] = p["b"]
    return q


def quantize_opt_weights(params):
    """Weight-only int8 for an OPT params tree (opt.init / convert_torch
    layout): the six matmul weights of every decoder layer are quantized
    per-output-channel; embeddings (also the tied lm_head), positional
    table and LayerNorms stay fp. The result drops into every OPT entry
    point unchanged (prefill / decode_step / decode_chunk / generate /
    serving.GenerationServer) because they all project through
    nn.core.linear."""
    out = dict(params)
    out["layers"] = [
        {k: (quantize_linear(lp[k]) if k in _OPT_LAYER_LINEARS else lp[k])
         for k in lp}
        for lp in params["layers"]]
    return out
