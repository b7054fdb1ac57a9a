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
