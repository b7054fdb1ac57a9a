"""MobileNetV3-Large (reference models.py:203-219: torchvision
mobilenet_v3_large with classifier[3] replaced by Linear(1280, n)).

torchvision parity:
  * BN eps 1e-3, momentum 0.01;
  * inverted residual blocks with ReLU or Hardswish, optional SE with
    ReLU inner + Hardsigmoid scale, squeeze = make_divisible(exp/4, 8);
  * classifier: Linear(960,1280) -> Hardswish -> Dropout(0.2) -> Linear.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ...nn import core as nn
from ..registry import ModelDef
from .efficientnet_common import _make_divisible


class Row(NamedTuple):
    kernel: int
    exp: int
    out: int
    se: bool
    hs: bool       # hardswish (else relu)
    stride: int


# torchvision mobilenet_v3_large inverted-residual settings
ROWS: Tuple[Row, ...] = (
    Row(3, 16, 16, False, False, 1),
    Row(3, 64, 24, False, False, 2),
    Row(3, 72, 24, False, False, 1),
    Row(5, 72, 40, True, False, 2),
    Row(5, 120, 40, True, False, 1),
    Row(5, 120, 40, True, False, 1),
    Row(3, 240, 80, False, True, 2),
    Row(3, 200, 80, False, True, 1),
    Row(3, 184, 80, False, True, 1),
    Row(3, 184, 80, False, True, 1),
    Row(3, 480, 112, True, True, 1),
    Row(3, 672, 112, True, True, 1),
    Row(5, 672, 160, True, True, 2),
    Row(5, 960, 160, True, True, 1),
    Row(5, 960, 160, True, True, 1),
)

STEM_OUT = 16
LAST_CONV = 960
HEAD_HIDDEN = 1280
BN_EPS = 1e-3
BN_MOM = 0.01


def _init_cna(key, k, c_in, c_out, groups=1, dtype=jnp.float32):
    p = {"conv": nn.init_conv(key, k, k, c_in, c_out, groups=groups, dtype=dtype)}
    p["bn"], s = nn.init_batchnorm(c_out, dtype)
    return p, {"bn": s}


def init(key, num_classes: int = 4, dtype=jnp.float32):
    params = {"stem": None, "blocks": [], "last": None,
              "fc1": None, "fc2": None}
    state = {"stem": None, "blocks": [], "last": None}
    ks = jax.random.split(key, 5)
    params["stem"], state["stem"] = _init_cna(ks[0], 3, 3, STEM_OUT, dtype=dtype)
    c_in = STEM_OUT
    for i, r in enumerate(ROWS):
        kb = jax.random.fold_in(key, 10 + i)
        kk = jax.random.split(kb, 5)
        p, s = {}, {}
        if r.exp != c_in:
            p["expand"], s["expand"] = _init_cna(kk[0], 1, c_in, r.exp, dtype=dtype)
        p["dw"], s["dw"] = _init_cna(kk[1], r.kernel, r.exp, r.exp,
                                     groups=r.exp, dtype=dtype)
        if r.se:
            sq = _make_divisible(r.exp // 4)
            p["se"] = {"fc1": nn.init_conv(kk[2], 1, 1, r.exp, sq, dtype=dtype, bias=True),
                       "fc2": nn.init_conv(kk[3], 1, 1, sq, r.exp, dtype=dtype, bias=True)}
        p["project"], s["project"] = _init_cna(kk[4], 1, r.exp, r.out, dtype=dtype)
        params["blocks"].append(p)
        state["blocks"].append(s)
        c_in = r.out
    params["last"], state["last"] = _init_cna(ks[1], 1, c_in, LAST_CONV, dtype=dtype)
    params["fc1"] = nn.init_linear(ks[2], LAST_CONV, HEAD_HIDDEN, dtype)
    params["fc2"] = nn.init_linear(ks[3], HEAD_HIDDEN, num_classes, dtype)
    return params, state


def _cna(p, s, x, *, k, stride=1, groups=1, act=None, train=False):
    y = nn.conv2d(p["conv"], x, stride=stride, padding=(k - 1) // 2, groups=groups)
    if "bn" in p:          # absent after nn.fold.fold_batchnorm (eval-only)
        y, new = nn.batchnorm(p["bn"], s["bn"], y, train=train, eps=BN_EPS,
                              momentum=BN_MOM)
        new_s = {"bn": new}
    else:
        new_s = {}
    if act is not None:
        y = act(y)
    return y, new_s


def _se(p, x):
    s = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
    s = nn.relu(nn.conv2d(p["fc1"], s))
    s = nn.hardsigmoid(nn.conv2d(p["fc2"], s))
    return x * s


def apply(params, state, x, *, train=False, rng=None, dropout_rate=0.2):
    new_state = {"stem": None, "blocks": [], "last": None}
    h, new_state["stem"] = _cna(params["stem"], state["stem"], x, k=3, stride=2,
                                act=nn.hardswish, train=train)
    for i, r in enumerate(ROWS):
        p, s = params["blocks"][i], state["blocks"][i]
        act = nn.hardswish if r.hs else nn.relu
        ns = {}
        inp = h
        y = h
        if "expand" in p:
            y, ns["expand"] = _cna(p["expand"], s["expand"], y, k=1, act=act,
                                   train=train)
        y, ns["dw"] = _cna(p["dw"], s["dw"], y, k=r.kernel, stride=r.stride,
                           groups=r.exp, act=act, train=train)
        if r.se:
            y = _se(p["se"], y)
        y, ns["project"] = _cna(p["project"], s["project"], y, k=1, act=None,
                                train=train)
        if r.stride == 1 and inp.shape[-1] == r.out:
            y = y + inp
        h = y
        new_state["blocks"].append(ns)
    h, new_state["last"] = _cna(params["last"], state["last"], h, k=1,
                                act=nn.hardswish, train=train)
    pooled = nn.global_avg_pool(h)
    z = nn.hardswish(nn.linear(params["fc1"], pooled))
    if train and rng is not None:
        z = nn.dropout(rng, z, dropout_rate, train)
    return nn.linear(params["fc2"], z), new_state


def _c_cna(sd, pre):
    p = {"conv": {"w": jnp.asarray(sd[pre + ".0.weight"]).transpose(2, 3, 1, 0)},
         "bn": {"scale": jnp.asarray(sd[pre + ".1.weight"]),
                "bias": jnp.asarray(sd[pre + ".1.bias"])}}
    s = {"bn": {"mean": jnp.asarray(sd[pre + ".1.running_mean"]),
                "var": jnp.asarray(sd[pre + ".1.running_var"])}}
    return p, s


def convert_torch(sd, num_classes: int = 4):
    params = {"stem": None, "blocks": [], "last": None}
    state = {"stem": None, "blocks": [], "last": None}
    params["stem"], state["stem"] = _c_cna(sd, "features.0")
    c_in = STEM_OUT
    for i, r in enumerate(ROWS):
        pre = f"features.{i + 1}.block"
        p, s = {}, {}
        k = 0
        if r.exp != c_in:
            p["expand"], s["expand"] = _c_cna(sd, pre + f".{k}")
            k += 1
        p["dw"], s["dw"] = _c_cna(sd, pre + f".{k}")
        k += 1
        if r.se:
            p["se"] = {
                "fc1": {"w": jnp.asarray(sd[pre + f".{k}.fc1.weight"]).transpose(2, 3, 1, 0),
                        "b": jnp.asarray(sd[pre + f".{k}.fc1.bias"])},
                "fc2": {"w": jnp.asarray(sd[pre + f".{k}.fc2.weight"]).transpose(2, 3, 1, 0),
                        "b": jnp.asarray(sd[pre + f".{k}.fc2.bias"])}}
            k += 1
        p["project"], s["project"] = _c_cna(sd, pre + f".{k}")
        params["blocks"].append(p)
        state["blocks"].append(s)
        c_in = r.out
    params["last"], state["last"] = _c_cna(sd, f"features.{len(ROWS) + 1}")
    params["fc1"] = {"w": jnp.asarray(sd["classifier.0.weight"]).T,
                     "b": jnp.asarray(sd["classifier.0.bias"])}
    w = jnp.asarray(sd["classifier.3.weight"]).T
    if w.shape[1] != num_classes:
        raise ValueError("classifier class-count mismatch")
    params["fc2"] = {"w": w, "b": jnp.asarray(sd["classifier.3.bias"])}
    return params, state


def model_def(name: str = "mb") -> ModelDef:
    return ModelDef(name=name, init=init, apply=apply,
                    input_size=(224, 224), feature_dim=LAST_CONV,
                    convert_torch=convert_torch,
                    extras={"bn_eps": BN_EPS})
