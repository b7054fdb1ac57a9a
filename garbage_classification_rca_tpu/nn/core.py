"""Minimal functional NN layer library.

Every layer is a pure function over an explicit parameter pytree (nested
dicts of ``jnp.ndarray``).  No module classes, no tracing magic: a model is
``apply(params, state, x, ...) -> (y, new_state)`` and composes freely under
``jax.jit`` / ``pjit`` / ``jax.grad``.

Layout conventions (TPU-first):
  * images are NHWC (channels-last feeds XLA's conv tiling best),
  * conv kernels are HWIO,
  * linear kernels are [in, out] (``x @ w + b``).

The torch checkpoint converter (checkpoint/torch_convert.py) maps the
reference's OIHW / [out, in] tensors into these layouts.

Numerical parity targets (for loading reference .pth checkpoints):
  * BatchNorm eps 1e-5, momentum 0.1 — torch defaults used by torchvision
    backbones (reference models.py:9-277 all build stock torchvision nets).
  * LayerNorm eps matches each architecture (passed per call site).
  * GELU exact (erf) unless an arch specifies tanh approximation.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, Any]
PRNGKey = jax.Array

# ---------------------------------------------------------------------------
# initializers (match torch defaults so from-scratch training behaves alike)
# ---------------------------------------------------------------------------


def _fan_in_uniform(key: PRNGKey, shape, fan_in: int, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init_linear(key: PRNGKey, d_in: int, d_out: int, dtype=jnp.float32,
                bias: bool = True) -> Params:
    """torch.nn.Linear default init: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    p = {"w": _fan_in_uniform(kw, (d_in, d_out), d_in, dtype)}
    if bias:
        p["b"] = _fan_in_uniform(kb, (d_out,), d_in, dtype)
    return p


def linear(p: Params, x: jnp.ndarray, *, precision=None) -> jnp.ndarray:
    y = jnp.matmul(x, p["w"].astype(x.dtype), precision=precision)
    if "w_scale" in p:
        # Weight-only int8 (ops/quant.py quantize_linear): w is int8 in
        # HBM; the per-output-channel f32 scale is applied to the [.., out]
        # activations after the contraction, which equals dequantizing the
        # weight first (the scale is constant along the contracted dim).
        y = y * p["w_scale"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def init_conv(key: PRNGKey, kh: int, kw: int, c_in: int, c_out: int,
              groups: int = 1, dtype=jnp.float32, bias: bool = False) -> Params:
    """torch.nn.Conv2d default init (kaiming_uniform a=sqrt(5))."""
    k1, k2 = jax.random.split(key)
    fan_in = kh * kw * (c_in // groups)
    p = {"w": _fan_in_uniform(k1, (kh, kw, c_in // groups, c_out), fan_in, dtype)}
    if bias:
        p["b"] = _fan_in_uniform(k2, (c_out,), fan_in, dtype)
    return p


def conv2d(p: Params, x: jnp.ndarray, *, stride: Union[int, Tuple[int, int]] = 1,
           padding: Union[str, int, Tuple[int, int]] = 0, groups: int = 1,
           dilation: Union[int, Tuple[int, int]] = 1) -> jnp.ndarray:
    """NHWC conv with torch-style integer padding (or 'SAME'/'VALID')."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    elif isinstance(padding, tuple):
        padding = [(padding[0], padding[0]), (padding[1], padding[1])]
    w = p["w"].astype(x.dtype)
    y = lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        rhs_dilation=dilation, feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------


def init_batchnorm(c: int, dtype=jnp.float32) -> Tuple[Params, Params]:
    params = {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}
    state = {"mean": jnp.zeros((c,), jnp.float32),
             "var": jnp.ones((c,), jnp.float32)}
    return params, state


def batchnorm(p: Params, s: Params, x: jnp.ndarray, *, train: bool = False,
              eps: float = 1e-5, momentum: float = 0.1
              ) -> Tuple[jnp.ndarray, Params]:
    """BatchNorm over NHWC (axis=-1) or N,C (2D) inputs.

    torch semantics: in train mode running stats update with
    ``new = (1-momentum)*old + momentum*batch`` and the *batch* statistics
    normalize the activations; running var update uses the unbiased batch
    variance. Stats are kept in fp32 regardless of compute dtype.
    """
    reduce_axes = tuple(range(x.ndim - 1))
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=reduce_axes)
        var = jnp.var(xf, axis=reduce_axes)
        n = x.size // x.shape[-1]
        unbiased = var * (n / max(n - 1, 1))
        new_s = {"mean": (1 - momentum) * s["mean"] + momentum * mean,
                 "var": (1 - momentum) * s["var"] + momentum * unbiased}
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    inv = lax.rsqrt(var + eps) * p["scale"].astype(jnp.float32)
    shift = p["bias"].astype(jnp.float32) - mean * inv
    y = x.astype(jnp.float32) * inv + shift
    return y.astype(x.dtype), new_s


def init_layernorm(shape: Union[int, Sequence[int]], dtype=jnp.float32) -> Params:
    if isinstance(shape, int):
        shape = (shape,)
    return {"scale": jnp.ones(tuple(shape), dtype),
            "bias": jnp.zeros(tuple(shape), dtype)}


def layernorm(p: Params, x: jnp.ndarray, *, eps: float = 1e-5,
              axis: int = -1) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axis, keepdims=True)
    var = jnp.var(xf, axis=axis, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def init_embedding(key: PRNGKey, n: int, d: int, dtype=jnp.float32) -> Params:
    return {"w": jax.random.normal(key, (n, d), dtype) * 0.02}


def embedding(p: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(p["w"], ids, axis=0)


# ---------------------------------------------------------------------------
# activations (torch-parity variants)
# ---------------------------------------------------------------------------

relu = jax.nn.relu
relu6 = jax.nn.relu6
silu = jax.nn.silu
sigmoid = jax.nn.sigmoid
tanh = jnp.tanh


def gelu(x, approximate: bool = False):
    return jax.nn.gelu(x, approximate=approximate)


def hardsigmoid(x):
    # torch.nn.Hardsigmoid: relu6(x+3)/6
    return jax.nn.relu6(x + 3.0) / 6.0


def hardswish(x):
    return x * hardsigmoid(x)


# ---------------------------------------------------------------------------
# pooling
# ---------------------------------------------------------------------------


def avg_pool(x: jnp.ndarray, window: Union[int, Tuple[int, int]],
             stride: Optional[Union[int, Tuple[int, int]]] = None,
             padding: int = 0) -> jnp.ndarray:
    """NHWC average pool, torch AvgPool2d semantics (count_include_pad=True)."""
    if isinstance(window, int):
        window = (window, window)
    stride = window if stride is None else stride
    if isinstance(stride, int):
        stride = (stride, stride)
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    summed = lax.reduce_window(x.astype(jnp.float32), 0.0, lax.add,
                               (1, *window, 1), (1, *stride, 1), pads)
    return (summed / (window[0] * window[1])).astype(x.dtype)


def max_pool(x: jnp.ndarray, window: Union[int, Tuple[int, int]],
             stride: Optional[Union[int, Tuple[int, int]]] = None,
             padding: int = 0) -> jnp.ndarray:
    if isinstance(window, int):
        window = (window, window)
    stride = window if stride is None else stride
    if isinstance(stride, int):
        stride = (stride, stride)
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return lax.reduce_window(x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
                             else jnp.iinfo(x.dtype).min,
                             lax.max, (1, *window, 1), (1, *stride, 1), pads)


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC -> NC (torch AdaptiveAvgPool2d(1) + flatten)."""
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)


# ---------------------------------------------------------------------------
# regularization
# ---------------------------------------------------------------------------


def dropout(key: Optional[PRNGKey], x: jnp.ndarray, rate: float,
            train: bool) -> jnp.ndarray:
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class HFDropout:
    """Site-ordered encoder-internal dropout (``--hf_internal_dropout``).

    The reference keeps its HF text towers in train() mode during
    training even though their weights are frozen
    (/root/reference/CVPR_code/text_models.py:23-34 never calls .eval()
    on self.model inside forward), so the HF-internal p=0.1
    hidden/attention dropout stays ACTIVE and regularizes the head.
    Our towers were deterministic inside (PARITY.md "HF-internal
    dropout" divergence); this class reproduces the reference behavior
    as an opt-in.

    Semantics: identity when constructed with ``rng=None`` (the default
    everywhere — eval paths and all existing parity tests are
    byte-unchanged). With an rng, each call with p>0 folds an
    incrementing site counter into the base key, giving every dropout
    site an independent, deterministic mask. Inverted dropout (x/keep on
    kept elements) — identical to torch's F.dropout scaling.

    Placement parity with the torch models is proven by
    tests/test_hf_dropout.py: torch.nn.functional.dropout and this
    class are both monkeypatched to consume one shared host-side mask
    stream, and the train-mode outputs must match — that pins the exact
    call ORDER, shape, and p of every site against HF.
    """

    __slots__ = ("rng", "_n")

    def __init__(self, rng: Optional[PRNGKey] = None):
        self.rng = rng
        self._n = 0

    @property
    def active(self) -> bool:
        return self.rng is not None

    def __call__(self, x: jnp.ndarray, p: float) -> jnp.ndarray:
        if self.rng is None or p <= 0.0:
            return x
        self._n += 1
        return dropout(jax.random.fold_in(self.rng, self._n), x, p, True)

    def site_key(self, p: float):
        """Consume one dropout site and return its fold_in key (None when
        inactive or p<=0 — matching __call__'s no-increment early-out).

        For kernels that apply this site's mask internally: the flash
        training attention (kernels/mha_fused.mha_flash_train_dropout)
        draws bernoulli(key, 1-p) on the [B, H, N, N] weights — the exact
        mask __call__ would have produced at this site, so the fused and
        unfused graphs stay bit-comparable."""
        if self.rng is None or p <= 0.0:
            return None
        self._n += 1
        return jax.random.fold_in(self.rng, self._n)


def stochastic_depth(key: Optional[PRNGKey], x: jnp.ndarray, rate: float,
                     train: bool) -> jnp.ndarray:
    """torchvision stochastic_depth, mode='row' (per-sample)."""
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, keep, shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# recurrent (GRU — used by the bimodal fusion head,
# reference multimodal_model.py:311-318)
# ---------------------------------------------------------------------------


def init_gru(key: PRNGKey, d_in: int, d_hidden: int, dtype=jnp.float32) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(d_hidden)
    u = lambda k, s: jax.random.uniform(k, s, dtype, -bound, bound)
    return {"w_ih": u(k1, (d_in, 3 * d_hidden)),
            "w_hh": u(k2, (d_hidden, 3 * d_hidden)),
            "b_ih": u(k3, (3 * d_hidden,)),
            "b_hh": u(k4, (3 * d_hidden,))}


def gru_cell(p: Params, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.GRU cell math (gate order r,z,n)."""
    gi = x @ p["w_ih"] + p["b_ih"]
    gh = h @ p["w_hh"] + p["b_hh"]
    d = h.shape[-1]
    i_r, i_z, i_n = gi[..., :d], gi[..., d:2 * d], gi[..., 2 * d:]
    h_r, h_z, h_n = gh[..., :d], gh[..., d:2 * d], gh[..., 2 * d:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1 - z) * n + z * h


def gru(p: Params, x: jnp.ndarray, h0: Optional[jnp.ndarray] = None
        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run a GRU over time axis 1 of [B, T, D] via lax.scan; returns (seq, h_T).

    For T==1 inputs (the bimodal fusion head feeds single feature vectors,
    reference multimodal_model.py:869-880) this is a single cell step.
    """
    b, t, _ = x.shape
    d = p["w_hh"].shape[0]
    if h0 is None:
        h0 = jnp.zeros((b, d), x.dtype)

    def step(h, xt):
        h = gru_cell(p, h, xt)
        return h, h

    hT, seq = lax.scan(step, h0, jnp.swapaxes(x, 0, 1))
    return jnp.swapaxes(seq, 0, 1), hT


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 0.0) -> jnp.ndarray:
    """x / ||x||  (torch .norm(dim, keepdim=True) division — no eps by default,
    matching reference multimodal_model.py:662-665 which divides exactly).

    With eps, a (near-)zero vector maps to 0 with ZERO gradient via the
    double-where pattern. The previous ``maximum(n, eps)`` clamp fixed only
    the forward: ``d||x||/dx = x/||x||`` is 0/0 = NaN at x = 0, and the
    clamp's zero cotangent multiplies it into 0 * NaN = NaN — which NaN'd
    every image-tower gradient the first time modality dropout zeroed an
    image on a randomly-initialized tower (zero biases propagate the exact
    zero all the way to the pooled feature; pretrained towers never do,
    which is why the reference's exact division is safe for it)."""
    xf = x.astype(jnp.float32)
    if not eps:
        n = jnp.linalg.norm(xf, axis=axis, keepdims=True)
        return (xf / n).astype(x.dtype)
    sumsq = jnp.sum(xf * xf, axis=axis, keepdims=True)
    is_zero = sumsq <= eps * eps
    n = jnp.sqrt(jnp.where(is_zero, 1.0, sumsq))
    return jnp.where(is_zero, 0.0, xf / n).astype(x.dtype)
