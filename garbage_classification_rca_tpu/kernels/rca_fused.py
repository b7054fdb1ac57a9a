"""Fused MM-RCA Pallas TPU kernel.

One kernel computes the whole MM-RCA attention block
(multimodal_model.py:677-692): two single-head self-attentions (text
patches [16, 48], image patches [16, 80]) followed by the two reverse
cross-attentions ((1-A)/(N-1) mixing), each with LayerNorm + ReLU — with
every intermediate living in VMEM. The unfused XLA path materializes ~8
[B, 16, 96] intermediates in HBM; here a batch tile stays on-chip
end-to-end.

Numerics: all compute fp32 inside the kernel (the shapes are tiny — the
whole block is ~25 MFLOP at B=64 — so this kernel is about fusion/latency,
not MXU saturation). Matches ops.attention to ~1e-5.

Grid: one program per batch tile (TILE samples). Per-sample matmuls are
unrolled; Mosaic pads the <128 minor dims internally while reductions use
logical shapes, so LayerNorm over 96/48 stays exact.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_PATCH = 16
SA_KQ = 128
SA_V = 96
CA_KQ = 64
CA_V = 48


def _ln_relu(x, scale, bias, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return jnp.maximum(y, 0.0)


def _softmax(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _bdot(a, b_t):
    """Batched [T, N, D] @ [T, M, D]^T -> [T, N, M] via dot_general."""
    return jax.lax.dot_general(
        a, b_t, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _bdot_nm(a, b):
    """Batched [T, N, M] @ [T, M, D] -> [T, N, D]."""
    return jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _proj(x2d, w, b):
    return jnp.dot(x2d, w[:], preferred_element_type=jnp.float32) + b[:]


def _kernel(t_ref, i_ref,
            wq_t, bq_t, wk_t, bk_t, wv_t, bv_t, g_t, be_t,
            wq_i, bq_i, wk_i, bk_i, wv_i, bv_i, g_i, be_i,
            wq_ti, bq_ti, wk_ti, bk_ti, wv_ti, bv_ti, g_ti, be_ti,
            wq_it, bq_it, wk_it, bk_it, wv_it, bv_it, g_it, be_it,
            ti_ref, it_ref, *, tile: int, reverse: bool):
    """Whole tile batched: projections run as single [tile*16, D] matmuls
    (MXU-shaped), attention as batched dot_generals, softmax/LN on the VPU."""
    inv_sa = 1.0 / math.sqrt(SA_KQ)
    inv_ca = 1.0 / math.sqrt(CA_KQ)
    tn = tile * N_PATCH
    t2 = t_ref[:].astype(jnp.float32).reshape(tn, 48)
    i2 = i_ref[:].astype(jnp.float32).reshape(tn, 80)

    def sa(x2, wq, bq, wk, bk, wv, bv, g, be):
        q = _proj(x2, wq, bq).reshape(tile, N_PATCH, SA_KQ)
        k = _proj(x2, wk, bk).reshape(tile, N_PATCH, SA_KQ)
        v = _proj(x2, wv, bv).reshape(tile, N_PATCH, SA_V)
        w = _softmax(_bdot(q, k) * inv_sa)
        return _ln_relu(_bdot_nm(w, v), g[:], be[:])        # [T, 16, 96]

    t_sa = sa(t2, wq_t, bq_t, wk_t, bk_t, wv_t, bv_t, g_t, be_t)
    i_sa = sa(i2, wq_i, bq_i, wk_i, bk_i, wv_i, bv_i, g_i, be_i)
    t_sa2 = t_sa.reshape(tn, SA_V)
    i_sa2 = i_sa.reshape(tn, SA_V)

    def rca(q2, kv2, wq, bq, wk, bk, wv, bv, g, be):
        q = _proj(q2, wq, bq).reshape(tile, N_PATCH, CA_KQ)
        k = _proj(kv2, wk, bk).reshape(tile, N_PATCH, CA_KQ)
        v = _proj(kv2, wv, bv).reshape(tile, N_PATCH, CA_V)
        w = _softmax(_bdot(q, k) * inv_ca)
        if reverse:
            w = (1.0 - w) / (N_PATCH - 1)
        return _ln_relu(_bdot_nm(w, v), g[:], be[:])

    ti_ref[:] = rca(t_sa2, i_sa2, wq_ti, bq_ti, wk_ti, bk_ti, wv_ti, bv_ti,
                    g_ti, be_ti).astype(ti_ref.dtype)
    it_ref[:] = rca(i_sa2, t_sa2, wq_it, bq_it, wk_it, bk_it, wv_it, bv_it,
                    g_it, be_it).astype(it_ref.dtype)


def _weights(p) -> Tuple[jnp.ndarray, ...]:
    def blk(b):
        return (b["q"]["w"], b["q"]["b"], b["k"]["w"], b["k"]["b"],
                b["v"]["w"], b["v"]["b"], b["norm"]["scale"], b["norm"]["bias"])
    return blk(p["sa_txt"]) + blk(p["sa_img"]) + blk(p["rca_ti"]) + blk(p["rca_it"])


def _oracle(p, t, i, reverse: bool):
    """Pure-JAX reference graph (ops.attention) — the differentiation
    path for the custom VJP below."""
    from ..ops import attention as att

    t_sa = att.self_attention(p["sa_txt"], t)
    i_sa = att.self_attention(p["sa_img"], i)
    ti = att.reverse_cross_attention(p["rca_ti"], t_sa, i_sa, reverse)
    it = att.reverse_cross_attention(p["rca_it"], i_sa, t_sa, reverse)
    return ti, it


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def rca_fused_trainable(p, t, i, reverse: bool, interpret: bool = False):
    """Differentiable fused RCA: Pallas forward, XLA-autodiff backward.

    The backward recomputes the (cheap — ~25 MFLOP at B=64) block through
    the pure-JAX graph and differentiates it; residuals are just the
    inputs, so no extra HBM is held across the forward.
    """
    return rca_fused(p, t, i, reverse=reverse, interpret=interpret)


def _rca_fwd(p, t, i, reverse, interpret):
    return rca_fused(p, t, i, reverse=reverse, interpret=interpret), (p, t, i)


def _rca_bwd(reverse, interpret, res, g):
    p, t, i = res
    _, vjp = jax.vjp(lambda p_, t_, i_: _oracle(p_, t_, i_, reverse), p, t, i)
    return vjp(g)


rca_fused_trainable.defvjp(_rca_fwd, _rca_bwd)


@functools.partial(jax.jit, static_argnames=("reverse", "tile", "interpret"))
def rca_fused(p, t, i, *, reverse: bool, tile: int = 0,
              interpret: bool = False):
    """t: [B, 16, 48] text patches, i: [B, 16, 80] image patches ->
    (ti, it): 2x [B, 16, 48].

    tile=0 (default) processes the whole batch in one program up to 256
    samples (measured best on v5e: 169us vs 177us for the unfused XLA path
    at B=256; per-sample loops were 3x slower than XLA).
    """
    b = t.shape[0]
    if tile <= 0:
        tile = min(b, 256)
    pad = (-b) % tile
    if pad:
        t = jnp.pad(t, ((0, pad), (0, 0), (0, 0)))
        i = jnp.pad(i, ((0, pad), (0, 0), (0, 0)))
    bt = t.shape[0]
    weights = _weights(p)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]
    grid = (bt // tile,)
    blk3 = lambda d: pl.BlockSpec((tile, N_PATCH, d), lambda g: (g, 0, 0),
                                  memory_space=pltpu.VMEM)
    ti, it = pl.pallas_call(
        functools.partial(_kernel, tile=tile, reverse=reverse),
        grid=grid,
        in_specs=[blk3(48), blk3(80)] + w_specs,
        out_specs=(blk3(CA_V), blk3(CA_V)),
        out_shape=(jax.ShapeDtypeStruct((bt, N_PATCH, CA_V), t.dtype),
                   jax.ShapeDtypeStruct((bt, N_PATCH, CA_V), t.dtype)),
        interpret=interpret,
    )(t, i, *weights)
    if pad:
        ti, it = ti[:b], it[:b]
    return ti, it
