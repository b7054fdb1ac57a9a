"""Attention ops for the MM-RCA fusion family — pure-JAX reference path.

Re-implements (TPU-first, batched einsums, fp32 softmax) the two blocks of
the reference paper code:

  * ``SelfAttention``          — reference multimodal_model.py:39-68:
      single-head QKV linear attention over "patches" (a feature vector
      reshaped to [B, N, D]), scale 1/sqrt(d_kq), then LayerNorm -> ReLU.
  * ``ReverseCrossAttention``  — reference multimodal_model.py:71-108:
      Q from modality 1, K/V from modality 2; softmax weights A; when
      ``reverse`` is on, use (1 - A) / (N - 1) as the mixing weights (rows
      still sum to 1) before @V — i.e. attend to what the other modality
      did NOT attend to. Requires square attention (N1 == N2), asserted at
      reference multimodal_model.py:93 and enforced statically here.

The fused Pallas kernel (kernels/rca_fused.py) implements the same math in
one VMEM-resident kernel; these functions are the numerics oracle for its
tests and the fallback on non-TPU backends.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from ..nn import core as nn

Params = Dict[str, dict]


def init_self_attention(key, d_in: int, d_kq: int, d_v: int,
                        dtype=jnp.float32) -> Params:
    kq, kk, kv, _ = jax.random.split(key, 4)
    return {
        "q": nn.init_linear(kq, d_in, d_kq, dtype),
        "k": nn.init_linear(kk, d_in, d_kq, dtype),
        "v": nn.init_linear(kv, d_in, d_v, dtype),
        "norm": nn.init_layernorm(d_v, dtype),
    }


def init_cross_attention(key, d_in_q: int, d_in_kv: int, d_kq: int, d_v: int,
                         dtype=jnp.float32) -> Params:
    kq, kk, kv, _ = jax.random.split(key, 4)
    return {
        "q": nn.init_linear(kq, d_in_q, d_kq, dtype),
        "k": nn.init_linear(kk, d_in_kv, d_kq, dtype),
        "v": nn.init_linear(kv, d_in_kv, d_v, dtype),
        "norm": nn.init_layernorm(d_v, dtype),
    }


def _softmax_scaled(scores: jnp.ndarray, d_kq: int) -> jnp.ndarray:
    # fp32 softmax for stability regardless of compute dtype
    return jax.nn.softmax(scores.astype(jnp.float32) / math.sqrt(d_kq), axis=-1)


def self_attention(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """[B, N, D_in] -> [B, N, D_v].  LayerNorm + ReLU applied on the output."""
    q = nn.linear(p["q"], x)
    k = nn.linear(p["k"], x)
    v = nn.linear(p["v"], x)
    scores = jnp.einsum("bnd,bmd->bnm", q, k)
    w = _softmax_scaled(scores, q.shape[-1]).astype(v.dtype)
    ctx = jnp.einsum("bnm,bmd->bnd", w, v)
    return jax.nn.relu(nn.layernorm(p["norm"], ctx))


def reverse_cross_attention(p: Params, x_q: jnp.ndarray, x_kv: jnp.ndarray,
                            reverse: bool) -> jnp.ndarray:
    """Cross attention with optional reversed weights.

    x_q: [B, N, Dq] (queries), x_kv: [B, N, Dkv] (keys/values); N must match
    (square attention — reference multimodal_model.py:93).
    """
    if x_q.shape[1] != x_kv.shape[1]:
        raise ValueError(
            f"RCA requires square attention, got N_q={x_q.shape[1]} "
            f"N_kv={x_kv.shape[1]} (reference multimodal_model.py:93)")
    q = nn.linear(p["q"], x_q)
    k = nn.linear(p["k"], x_kv)
    v = nn.linear(p["v"], x_kv)
    scores = jnp.einsum("bnd,bmd->bnm", q, k)
    w = _softmax_scaled(scores, q.shape[-1])
    if reverse:
        n = w.shape[-1]
        w = (1.0 - w) / (n - 1)          # rows still sum to 1
    ctx = jnp.einsum("bnm,bmd->bnd", w.astype(v.dtype), v)
    return jax.nn.relu(nn.layernorm(p["norm"], ctx))
