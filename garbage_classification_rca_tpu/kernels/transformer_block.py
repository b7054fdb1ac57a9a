"""Fused transformer-encoder-block Pallas kernels.

Two kernels cover a pre-LN encoder layer (ViT models.py:222-258 geometry;
also the BLIP-2 EVA tower):

  attn_block: y = x + (MHA(LN1(x)) @ W_out + b_out)
  mlp_block:  y = x + (act(LN2(x) @ W1 + b1) @ W2 + b2)

Why: with attention already fused (mha_fused.py), XLA still materializes
per layer, in HBM: the LN outputs (2x), the packed qkv projection
([B, N, 3D] — 116 MB at ViT-B16 bs128), the attention output before the
out-projection, and the [B, N, 4D] MLP hidden (151 MB + its gelu read).
Per ViT-B16 layer at bs128 that is ~650 MB of avoidable traffic (~0.8 ms
at v5e HBM bandwidth, ~20% of the whole batch). Here each kernel reads x
once and writes the residual-added output once; every intermediate lives
in VMEM. Weight blocks use constant index maps so Mosaic keeps one copy
resident across batch tiles.

Numerics: LN/softmax in fp32; matmuls bf16-in/fp32-accumulate with bf16
intermediates — the same rounding class as the unfused XLA graph (whose
matmul outputs are also bf16 tensors).

Training: custom-VJP wrappers differentiate the equivalent XLA graph
(recompute; residuals are just x + the weights).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Abramowitz & Stegun 7.1.26 polynomial erf (|err| <= 1.5e-7 — far
    below bf16 resolution). Mosaic has no erf/erfc primitive."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    """erf-based GELU (torch nn.GELU default; torchvision ViT MLPs)."""
    return 0.5 * x * (1.0 + _erf(x * np.float32(1.0 / np.sqrt(2.0))))


def _ln(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _head_attention(qkv, heads, mask_bias=None):
    """Shared per-head softmax(QK^T)V over a packed [T, N, 3D] qkv block
    (both the pre-norm and post-norm attention kernels)."""
    t, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // heads
    scale = 1.0 / np.sqrt(dh)
    att = []
    for hd in range(heads):
        q = qkv[:, :, hd * dh:(hd + 1) * dh]
        k = qkv[:, :, d + hd * dh:d + (hd + 1) * dh]
        v = qkv[:, :, 2 * d + hd * dh:2 * d + (hd + 1) * dh]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if mask_bias is not None:
            s = s + mask_bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        att.append(jax.lax.dot_general(
            w, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(qkv.dtype))
    return jnp.concatenate(att, axis=-1).reshape(t * n, d)


def _attn_kernel(x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, wout_ref,
                 bout_ref, o_ref, *, heads, eps):
    # NOTE: body kept byte-stable rather than routed through
    # _head_attention so the persistent-cache key (and its compiled
    # executable) survives refactors. A measurement scare during the
    # round-5 cleanup looked like a 1.8% regression from the rewritten
    # trace, but the byte-identical restored trace measured the same
    # 3,938 img/s minutes later — device/session drift, not the code;
    # keeping the stable bytes still avoids pointless recompiles.
    # The post-norm kernel (new this round) uses the shared helper.
    t, n, d = x_ref.shape
    dh = d // heads
    scale = 1.0 / np.sqrt(dh)
    x = x_ref[:]
    h = _ln(x, ls_ref[:], lb_ref[:], eps).astype(x.dtype).reshape(t * n, d)
    qkv = (jnp.dot(h, wqkv_ref[:], preferred_element_type=jnp.float32)
           + bqkv_ref[:]).astype(x.dtype)
    qkv = qkv.reshape(t, n, 3 * d)
    att = []
    for hd in range(heads):
        q = qkv[:, :, hd * dh:(hd + 1) * dh]
        k = qkv[:, :, d + hd * dh:d + (hd + 1) * dh]
        v = qkv[:, :, 2 * d + hd * dh:2 * d + (hd + 1) * dh]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        att.append(jax.lax.dot_general(
            w, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(x.dtype))
    a = jnp.concatenate(att, axis=-1).reshape(t * n, d)
    out = (jnp.dot(a, wout_ref[:], preferred_element_type=jnp.float32)
           + bout_ref[:])
    o_ref[:] = (x.astype(jnp.float32)
                + out.reshape(t, n, d)).astype(o_ref.dtype)


def _mlp_kernel(x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                o_ref, *, eps, act):
    t, n, d = x_ref.shape
    x = x_ref[:]
    h = _ln(x, ls_ref[:], lb_ref[:], eps).astype(x.dtype).reshape(t * n, d)
    h1 = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    if act == "gelu":
        h1 = _gelu_exact(h1)
    elif act == "relu":
        h1 = jnp.maximum(h1, 0.0)
    else:
        raise ValueError(act)
    h1 = h1.astype(x.dtype)
    out = jnp.dot(h1, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    o_ref[:] = (x.astype(jnp.float32)
                + out.reshape(t, n, d)).astype(o_ref.dtype)


_WEIGHT_BUDGET = 10 * 1024 * 1024  # bf16 bytes; ~16 MB VMEM minus act room


def attn_fits(d: int) -> bool:
    """Wqkv [D,3D] + Wout [D,D] must stay VMEM-resident (bf16)."""
    return 4 * d * d * 2 <= _WEIGHT_BUDGET


def mlp_fits(d: int, ffn: int) -> bool:
    """W1 [D,FFN] + W2 [FFN,D] must stay VMEM-resident (bf16). ViT-B16's
    9.4 MB fits (measured); EVA ViT-g's 34.6 MB does not — callers fall
    back per sub-block."""
    return 2 * d * ffn * 2 <= _WEIGHT_BUDGET


def blocks_fit(d: int, ffn: int) -> bool:
    return attn_fits(d) and mlp_fits(d, ffn)


def _tile_for(b, n, d, ffn):
    """Batch tile: keep scores + the larger of qkv / mlp-hidden in VMEM."""
    per_sample = max(n * n * 4 + 3 * n * d * 2,   # one head's scores + qkv
                     n * ffn * 2 * 2)             # mlp hidden (fp32+bf16)
    tile = max(1, (4 * 1024 * 1024) // max(per_sample, 1))
    tile = min(tile, b, 8)
    while b % tile:
        tile -= 1
    return max(tile, 1)


def _call(kern, x, weights, *, tile, interpret):
    b, n, d = x.shape
    grid = (b // tile,)
    blk = pl.BlockSpec((tile, n, d), lambda g: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]
    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[blk] + w_specs,
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        interpret=interpret,
    )(x, *weights)


def _pad_batch(x, tile):
    pad = (-x.shape[0]) % tile
    if pad:
        return jnp.pad(x, ((0, pad), (0, 0), (0, 0))), pad
    return x, 0


@functools.partial(jax.jit, static_argnames=("heads", "eps", "tile",
                                             "interpret"))
def attn_block(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, *, heads: int,
               eps: float = 1e-6, tile: int = 0, interpret=None):
    """x: [B, N, D] -> x + out_proj(MHA(LN(x))). wqkv: [D, 3D] packed
    q|k|v (the torchvision in_proj layout)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, d = x.shape
    if tile <= 0:
        tile = _tile_for(b, n, d, 4 * d)
    x_p, pad = _pad_batch(x, tile)
    out = _call(functools.partial(_attn_kernel, heads=heads, eps=eps),
                x_p, (ln_scale, ln_bias, wqkv, bqkv, wout, bout),
                tile=tile, interpret=interpret)
    return out[:b] if pad else out


@functools.partial(jax.jit, static_argnames=("eps", "act", "tile",
                                             "interpret"))
def mlp_block(x, ln_scale, ln_bias, w1, b1, w2, b2, *, eps: float = 1e-6,
              act: str = "gelu", tile: int = 0, interpret=None):
    """x: [B, N, D] -> x + W2 act(W1 LN(x))."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, d = x.shape
    if tile <= 0:
        tile = _tile_for(b, n, d, w1.shape[1])
    x_p, pad = _pad_batch(x, tile)
    out = _call(functools.partial(_mlp_kernel, eps=eps, act=act),
                x_p, (ln_scale, ln_bias, w1, b1, w2, b2),
                tile=tile, interpret=interpret)
    return out[:b] if pad else out


# ---------------------------------------------------------------------------
# reference graphs + custom VJPs (training path: recompute backward)
# ---------------------------------------------------------------------------


def attn_block_reference(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, *,
                         heads: int, eps: float = 1e-6):
    b, n, d = x.shape
    dh = d // heads
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    h = ((xf - mean) * jax.lax.rsqrt(var + eps)
         * ln_scale.astype(jnp.float32)
         + ln_bias.astype(jnp.float32)).astype(x.dtype)
    qkv = (h.reshape(b * n, d) @ wqkv + bqkv).reshape(b, n, 3 * d)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    rs = lambda a: a.reshape(b, n, heads, dh)
    s = jnp.einsum("bnhd,bmhd->bhnm", rs(q), rs(k),
                   preferred_element_type=jnp.float32) / np.sqrt(dh)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    a = jnp.einsum("bhnm,bmhd->bnhd", w, rs(v),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    out = a.reshape(b * n, d) @ wout + bout
    return (xf + out.reshape(b, n, d)).astype(x.dtype)


def mlp_block_reference(x, ln_scale, ln_bias, w1, b1, w2, b2, *,
                        eps: float = 1e-6, act: str = "gelu"):
    b, n, d = x.shape
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    h = ((xf - mean) * jax.lax.rsqrt(var + eps)
         * ln_scale.astype(jnp.float32)
         + ln_bias.astype(jnp.float32)).astype(x.dtype)
    h1 = (h.reshape(b * n, d) @ w1 + b1).astype(jnp.float32)
    h1 = (jax.nn.gelu(h1, approximate=False) if act == "gelu"
          else jnp.maximum(h1, 0.0)).astype(x.dtype)
    out = h1 @ w2 + b2
    return (xf + out.reshape(b, n, d).astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _attn_trainable(x, ls, lb, wqkv, bqkv, wout, bout, heads, eps):
    return attn_block(x, ls, lb, wqkv, bqkv, wout, bout, heads=heads,
                      eps=eps)


def _attn_fwd(x, ls, lb, wqkv, bqkv, wout, bout, heads, eps):
    return (_attn_trainable(x, ls, lb, wqkv, bqkv, wout, bout, heads, eps),
            (x, ls, lb, wqkv, bqkv, wout, bout))


def _attn_bwd(heads, eps, res, g):
    _, vjp = jax.vjp(lambda *a: attn_block_reference(*a, heads=heads,
                                                     eps=eps), *res)
    return vjp(g)


_attn_trainable.defvjp(_attn_fwd, _attn_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _mlp_trainable(x, ls, lb, w1, b1, w2, b2, eps, act):
    return mlp_block(x, ls, lb, w1, b1, w2, b2, eps=eps, act=act)


def _mlp_fwd(x, ls, lb, w1, b1, w2, b2, eps, act):
    return (_mlp_trainable(x, ls, lb, w1, b1, w2, b2, eps, act),
            (x, ls, lb, w1, b1, w2, b2))


def _mlp_bwd(eps, act, res, g):
    _, vjp = jax.vjp(lambda *a: mlp_block_reference(*a, eps=eps, act=act),
                     *res)
    return vjp(g)


_mlp_trainable.defvjp(_mlp_fwd, _mlp_bwd)


def attn_block_trainable(x, ls, lb, wqkv, bqkv, wout, bout, *, heads,
                         eps=1e-6):
    return _attn_trainable(x, ls, lb, wqkv, bqkv, wout, bout, heads, eps)


def mlp_block_trainable(x, ls, lb, w1, b1, w2, b2, *, eps=1e-6,
                        act="gelu"):
    return _mlp_trainable(x, ls, lb, w1, b1, w2, b2, eps, act)


# ---------------------------------------------------------------------------
# POST-norm fused blocks (round 5) — the BERT-family text-tower layer
# (encoder_common.postnorm_layer: bert/distilbert/roberta, 768/3072/12,
# LN eps 1e-12, exact gelu):
#
#   attn: y = LN_att(x + out_proj(MHA(x, key_mask)))
#   mlp:  y = LN_ffn(x + W2 act(W1 x))
#
# Same HBM argument as the pre-norm kernels: with attention-only fusion,
# XLA still materializes the q/k/v projections, the attention output, and
# the [B, N, 4D] MLP hidden per layer. At the production seq-64 bucket the
# text eval measured ~55 TF/s effective — half the chip's matmul-chain
# ceiling — precisely because those short-sequence intermediates are
# bandwidth, not FLOPs. The key-validity mask rides as a [t, 1, n] block
# (same additive -1e30 bias as mha_fused).
# ---------------------------------------------------------------------------

_NEG = -1e30


def _postnorm_attn_kernel(x_ref, m_ref, wqkv_ref, bqkv_ref, wout_ref,
                          bout_ref, ls_ref, lb_ref, o_ref, *, heads, eps):
    t, n, d = x_ref.shape
    x = x_ref[:]
    qkv = (jnp.dot(x.reshape(t * n, d), wqkv_ref[:],
                   preferred_element_type=jnp.float32)
           + bqkv_ref[:]).astype(x.dtype).reshape(t, n, 3 * d)
    mask_bias = (m_ref[:].astype(jnp.float32) - 1.0) * (-_NEG)  # [t, 1, n]
    a = _head_attention(qkv, heads, mask_bias)
    out = (jnp.dot(a, wout_ref[:], preferred_element_type=jnp.float32)
           + bout_ref[:]).astype(x.dtype)
    y = _ln(x + out.reshape(t, n, d), ls_ref[:], lb_ref[:], eps)
    o_ref[:] = y.astype(o_ref.dtype)


def _postnorm_mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls_ref,
                         lb_ref, o_ref, *, eps, act):
    t, n, d = x_ref.shape
    x = x_ref[:]
    h1 = (jnp.dot(x.reshape(t * n, d), w1_ref[:],
                  preferred_element_type=jnp.float32) + b1_ref[:])
    if act == "gelu":
        h1 = _gelu_exact(h1)
    elif act == "relu":
        h1 = jnp.maximum(h1, 0.0)
    else:
        raise ValueError(act)
    h1 = h1.astype(x.dtype)
    out = (jnp.dot(h1, w2_ref[:], preferred_element_type=jnp.float32)
           + b2_ref[:]).astype(x.dtype)
    y = _ln(x + out.reshape(t, n, d), ls_ref[:], lb_ref[:], eps)
    o_ref[:] = y.astype(o_ref.dtype)


def postnorm_blocks_fit(d: int, ffn: int, n: int,
                        itemsize: int = 2) -> bool:
    """VMEM-resident weights AND the tile=1 activations must fit both
    sub-kernels (seq-512 MLP hidden alone is ~6 MB — rejected; the
    seq-64 production bucket fits with room)."""
    cap = 14 * 1024 * 1024
    attn = (4 * d * d * itemsize                      # wqkv + wout
            + n * n * 4 + 3 * n * d * itemsize        # scores + qkv
            + 3 * n * d * itemsize)                   # x/out/y blocks
    mlp = (2 * d * ffn * itemsize                     # w1 + w2
           + n * ffn * (4 + itemsize)                 # hidden fp32+cast
           + 3 * n * d * itemsize)
    return max(attn, mlp) <= cap


def _postnorm_tile(b, n, d, ffn, itemsize):
    per_sample = max(n * n * 4 + 6 * n * d * itemsize,
                     n * ffn * (4 + itemsize))
    tile = max(1, (4 * 1024 * 1024) // max(per_sample, 1))
    tile = min(tile, b, 8)
    while b % tile:
        tile -= 1
    return max(tile, 1)


@functools.partial(jax.jit, static_argnames=("heads", "eps", "tile",
                                             "interpret"))
def postnorm_attn_block(x, mask, wqkv, bqkv, wout, bout, ln_scale, ln_bias,
                        *, heads: int, eps: float = 1e-12, tile: int = 0,
                        interpret=None):
    """x: [B, N, D], mask: [B, N] key validity ->
    LN(x + out_proj(MHA(x)))."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, d = x.shape
    if tile <= 0:
        tile = _postnorm_tile(b, n, d, 4 * d, x.dtype.itemsize)
    x_p, pad = _pad_batch(x, tile)
    if pad:
        mask = jnp.pad(mask, ((0, pad), (0, 0)), constant_values=1)
    bt = x_p.shape[0]
    blk = pl.BlockSpec((tile, n, d), lambda g: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    m_blk = pl.BlockSpec((tile, 1, n), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(6)]
    out = pl.pallas_call(
        functools.partial(_postnorm_attn_kernel, heads=heads, eps=eps),
        grid=(bt // tile,),
        in_specs=[blk, m_blk] + w_specs,
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((bt, n, d), x.dtype),
        interpret=interpret,
    )(x_p, mask.reshape(bt, 1, n), wqkv, bqkv, wout, bout, ln_scale,
      ln_bias)
    return out[:b] if pad else out


@functools.partial(jax.jit, static_argnames=("eps", "act", "tile",
                                             "interpret"))
def postnorm_mlp_block(x, w1, b1, w2, b2, ln_scale, ln_bias, *,
                       eps: float = 1e-12, act: str = "gelu",
                       tile: int = 0, interpret=None):
    """x: [B, N, D] -> LN(x + W2 act(W1 x))."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, d = x.shape
    if tile <= 0:
        tile = _postnorm_tile(b, n, d, w1.shape[1], x.dtype.itemsize)
    x_p, pad = _pad_batch(x, tile)
    out = _call(functools.partial(_postnorm_mlp_kernel, eps=eps, act=act),
                x_p, (w1, b1, w2, b2, ln_scale, ln_bias), tile=tile,
                interpret=interpret)
    return out[:b] if pad else out
