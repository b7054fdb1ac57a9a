"""ShuffleNetV2 x2.0 (reference models.py:261-277: torchvision
shufflenet_v2_x2_0 with fc replaced by Linear(2048, n)) — the MVP config
of BASELINE.json ("shuffle_net image-only eval").

torchvision parity: conv1 (3->24, s2) -> maxpool3 s2 -> stage2/3/4
(repeats 4/8/4, out 244/488/976) -> conv5 (1x1 -> 2048) -> fc.
Channel shuffle with groups=2; stage-leading downsample units process the
full input through both branches; regular units split channels in half.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ...nn import core as nn
from ..registry import ModelDef

STAGE_OUT: Tuple[int, ...] = (244, 488, 976)
REPEATS: Tuple[int, ...] = (4, 8, 4)
CONV1_OUT = 24
CONV5_OUT = 2048


def channel_shuffle(x: jnp.ndarray, groups: int = 2) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


def _init_cb(key, k, c_in, c_out, groups=1, dtype=jnp.float32):
    p = {"conv": nn.init_conv(key, k, k, c_in, c_out, groups=groups, dtype=dtype)}
    p["bn"], s = nn.init_batchnorm(c_out, dtype)
    return p, {"bn": s}


def init(key, num_classes: int = 4, dtype=jnp.float32):
    params = {"conv1": None, "stages": [], "conv5": None, "fc": None}
    state = {"conv1": None, "stages": [], "conv5": None}
    ks = jax.random.split(key, 4)
    params["conv1"], state["conv1"] = _init_cb(ks[0], 3, 3, CONV1_OUT, dtype=dtype)
    c_in = CONV1_OUT
    for si, (c_out, n) in enumerate(zip(STAGE_OUT, REPEATS)):
        sp, ss = [], []
        half = c_out // 2
        for j in range(n):
            kb = jax.random.fold_in(key, si * 100 + j)
            kk = jax.random.split(kb, 6)
            p, s = {}, {}
            if j == 0:
                p["b1_dw"], s["b1_dw"] = _init_cb(kk[0], 3, c_in, c_in,
                                                  groups=c_in, dtype=dtype)
                p["b1_pw"], s["b1_pw"] = _init_cb(kk[1], 1, c_in, half, dtype=dtype)
                b2_in = c_in
            else:
                b2_in = half
            p["b2_pw1"], s["b2_pw1"] = _init_cb(kk[2], 1, b2_in, half, dtype=dtype)
            p["b2_dw"], s["b2_dw"] = _init_cb(kk[3], 3, half, half,
                                              groups=half, dtype=dtype)
            p["b2_pw2"], s["b2_pw2"] = _init_cb(kk[4], 1, half, half, dtype=dtype)
            sp.append(p)
            ss.append(s)
        params["stages"].append(sp)
        state["stages"].append(ss)
        c_in = c_out
    params["conv5"], state["conv5"] = _init_cb(ks[1], 1, c_in, CONV5_OUT, dtype=dtype)
    params["fc"] = nn.init_linear(ks[2], CONV5_OUT, num_classes, dtype)
    return params, state


def _cb(p, s, x, *, k, stride=1, groups=1, act=True, train=False):
    y = nn.conv2d(p["conv"], x, stride=stride, padding=(k - 1) // 2, groups=groups)
    if "bn" in p:          # absent after nn.fold.fold_batchnorm (eval-only)
        y, new = nn.batchnorm(p["bn"], s["bn"], y, train=train)
        new_s = {"bn": new}
    else:
        new_s = {}
    if act:
        y = nn.relu(y)
    return y, new_s


def apply(params, state, x, *, train=False, rng=None):
    del rng
    new_state = {"conv1": None, "stages": [], "conv5": None}
    h, new_state["conv1"] = _cb(params["conv1"], state["conv1"], x, k=3,
                                stride=2, train=train)
    h = nn.max_pool(h, 3, 2, padding=1)
    for si in range(len(STAGE_OUT)):
        ssn = []
        for j, (p, s) in enumerate(zip(params["stages"][si],
                                       state["stages"][si])):
            ns = {}
            if j == 0:
                ci = h.shape[-1]
                b1, ns["b1_dw"] = _cb(p["b1_dw"], s["b1_dw"], h, k=3, stride=2,
                                      groups=ci, act=False, train=train)
                b1, ns["b1_pw"] = _cb(p["b1_pw"], s["b1_pw"], b1, k=1, train=train)
                b2 = h
                stride = 2
            else:
                b1, b2 = jnp.split(h, 2, axis=-1)
                stride = 1
            y, ns["b2_pw1"] = _cb(p["b2_pw1"], s["b2_pw1"], b2, k=1, train=train)
            y, ns["b2_dw"] = _cb(p["b2_dw"], s["b2_dw"], y, k=3, stride=stride,
                                 groups=y.shape[-1], act=False, train=train)
            y, ns["b2_pw2"] = _cb(p["b2_pw2"], s["b2_pw2"], y, k=1, train=train)
            h = channel_shuffle(jnp.concatenate([b1, y], axis=-1))
            ssn.append(ns)
        new_state["stages"].append(ssn)
    h, new_state["conv5"] = _cb(params["conv5"], state["conv5"], h, k=1,
                                train=train)
    pooled = nn.global_avg_pool(h)
    return nn.linear(params["fc"], pooled), new_state


def _c_cb(sd, conv_key, bn_key):
    p = {"conv": {"w": jnp.asarray(sd[conv_key + ".weight"]).transpose(2, 3, 1, 0)},
         "bn": {"scale": jnp.asarray(sd[bn_key + ".weight"]),
                "bias": jnp.asarray(sd[bn_key + ".bias"])}}
    s = {"bn": {"mean": jnp.asarray(sd[bn_key + ".running_mean"]),
                "var": jnp.asarray(sd[bn_key + ".running_var"])}}
    return p, s


def convert_torch(sd, num_classes: int = 4):
    params = {"conv1": None, "stages": [], "conv5": None, "fc": None}
    state = {"conv1": None, "stages": [], "conv5": None}
    params["conv1"], state["conv1"] = _c_cb(sd, "conv1.0", "conv1.1")
    for si, n in enumerate(REPEATS):
        sp, ss = [], []
        for j in range(n):
            pre = f"stage{si + 2}.{j}."
            p, s = {}, {}
            if j == 0:
                p["b1_dw"], s["b1_dw"] = _c_cb(sd, pre + "branch1.0", pre + "branch1.1")
                p["b1_pw"], s["b1_pw"] = _c_cb(sd, pre + "branch1.2", pre + "branch1.3")
            p["b2_pw1"], s["b2_pw1"] = _c_cb(sd, pre + "branch2.0", pre + "branch2.1")
            p["b2_dw"], s["b2_dw"] = _c_cb(sd, pre + "branch2.3", pre + "branch2.4")
            p["b2_pw2"], s["b2_pw2"] = _c_cb(sd, pre + "branch2.5", pre + "branch2.6")
            sp.append(p)
            ss.append(s)
        params["stages"].append(sp)
        state["stages"].append(ss)
    params["conv5"], state["conv5"] = _c_cb(sd, "conv5.0", "conv5.1")
    w = jnp.asarray(sd["fc.weight"]).T
    if w.shape[1] != num_classes:
        raise ValueError("fc class-count mismatch")
    params["fc"] = {"w": w, "b": jnp.asarray(sd["fc.bias"])}
    return params, state


def model_def(name: str = "shuffle_net") -> ModelDef:
    return ModelDef(name=name, init=init, apply=apply,
                    input_size=(224, 224), feature_dim=CONV5_OUT,
                    convert_torch=convert_torch,
                    extras={"bn_eps": 1e-5})
