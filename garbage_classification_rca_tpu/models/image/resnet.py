"""ResNet-18 / 50 / 152 (reference models.py:127-181: stock torchvision
resnets with fc replaced by Linear(feat, n)).

torchvision layout converted: conv1/bn1, layer{1..4}.{j}.conv{1..3} +
bn{1..3} (+ downsample.0/.1 at stage starts), fc. BasicBlock for res18,
Bottleneck for res50/res152 (stride on conv2, torchvision v1.5 style).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ...nn import core as nn
from ..registry import ModelDef


@dataclass(frozen=True)
class ResNetConfig:
    block: str                 # 'basic' | 'bottleneck'
    layers: Tuple[int, int, int, int]
    width: int = 64


CONFIGS = {
    "res18": ResNetConfig("basic", (2, 2, 2, 2)),
    "res50": ResNetConfig("bottleneck", (3, 4, 6, 3)),
    "res152": ResNetConfig("bottleneck", (3, 8, 36, 3)),
}

EXPANSION = {"basic": 1, "bottleneck": 4}


def _init_conv_bn(key, k, c_in, c_out, dtype):
    p = {"conv": nn.init_conv(key, k, k, c_in, c_out, dtype=dtype)}
    p["bn"], s = nn.init_batchnorm(c_out, dtype)
    return p, {"bn": s}


def init(key, cfg: ResNetConfig, num_classes: int = 4, dtype=jnp.float32):
    exp = EXPANSION[cfg.block]
    params = {"stem": None, "layers": [], "fc": None}
    state = {"stem": None, "layers": []}
    k0, kfc, key = jax.random.split(key, 3)
    params["stem"], state["stem"] = _init_conv_bn(k0, 7, 3, 64, dtype)
    c_in = 64
    for si, n in enumerate(cfg.layers):
        c_mid = cfg.width * (2 ** si)
        c_out = c_mid * exp
        sp, ss = [], []
        for j in range(n):
            kb = jax.random.fold_in(key, si * 100 + j)
            ks = jax.random.split(kb, 4)
            p, s = {}, {}
            if cfg.block == "basic":
                p["c1"], s["c1"] = _init_conv_bn(ks[0], 3, c_in if j == 0 else c_out, c_out, dtype)
                p["c2"], s["c2"] = _init_conv_bn(ks[1], 3, c_out, c_out, dtype)
            else:
                ci = c_in if j == 0 else c_out
                p["c1"], s["c1"] = _init_conv_bn(ks[0], 1, ci, c_mid, dtype)
                p["c2"], s["c2"] = _init_conv_bn(ks[1], 3, c_mid, c_mid, dtype)
                p["c3"], s["c3"] = _init_conv_bn(ks[2], 1, c_mid, c_out, dtype)
            if j == 0 and (si > 0 or exp != 1):
                p["down"], s["down"] = _init_conv_bn(ks[3], 1, c_in, c_out, dtype)
            sp.append(p)
            ss.append(s)
        params["layers"].append(sp)
        state["layers"].append(ss)
        c_in = c_out
    params["fc"] = nn.init_linear(kfc, c_in, num_classes, dtype)
    return params, state


def _cbr(p, s, x, *, k, stride=1, act=True, train=False):
    pad = (k - 1) // 2
    y = nn.conv2d(p["conv"], x, stride=stride, padding=pad)
    if "bn" in p:          # absent after nn.fold.fold_batchnorm (eval-only)
        y, new = nn.batchnorm(p["bn"], s["bn"], y, train=train)
        new_s = {"bn": new}
    else:
        new_s = {}
    if act:
        y = nn.relu(y)
    return y, new_s


def apply(params, state, x, cfg: ResNetConfig, *, train=False, rng=None):
    del rng
    new_state = {"stem": None, "layers": []}
    h, new_state["stem"] = _cbr(params["stem"], state["stem"], x, k=7,
                                stride=2, train=train)
    h = nn.max_pool(h, 3, 2, padding=1)
    for si, (sp, ss) in enumerate(zip(params["layers"], state["layers"])):
        ssn = []
        for j, (p, s) in enumerate(zip(sp, ss)):
            stride = 2 if (si > 0 and j == 0) else 1
            ns = {}
            identity = h
            if cfg.block == "basic":
                y, ns["c1"] = _cbr(p["c1"], s["c1"], h, k=3, stride=stride, train=train)
                y, ns["c2"] = _cbr(p["c2"], s["c2"], y, k=3, act=False, train=train)
            else:
                y, ns["c1"] = _cbr(p["c1"], s["c1"], h, k=1, train=train)
                y, ns["c2"] = _cbr(p["c2"], s["c2"], y, k=3, stride=stride, train=train)
                y, ns["c3"] = _cbr(p["c3"], s["c3"], y, k=1, act=False, train=train)
            if "down" in p:
                identity, ns["down"] = _cbr(p["down"], s["down"], h, k=1,
                                            stride=stride, act=False, train=train)
            h = nn.relu(y + identity)
            ssn.append(ns)
        new_state["layers"].append(ssn)
    pooled = nn.global_avg_pool(h)
    return nn.linear(params["fc"], pooled), new_state


def _c_cb(sd, conv_key, bn_key):
    p = {"conv": {"w": jnp.asarray(sd[conv_key + ".weight"]).transpose(2, 3, 1, 0)},
         "bn": {"scale": jnp.asarray(sd[bn_key + ".weight"]),
                "bias": jnp.asarray(sd[bn_key + ".bias"])}}
    s = {"bn": {"mean": jnp.asarray(sd[bn_key + ".running_mean"]),
                "var": jnp.asarray(sd[bn_key + ".running_var"])}}
    return p, s


def convert_torch(sd, cfg: ResNetConfig, num_classes: int = 4):
    params = {"stem": None, "layers": [], "fc": None}
    state = {"stem": None, "layers": []}
    params["stem"], state["stem"] = _c_cb(sd, "conv1", "bn1")
    n_convs = 2 if cfg.block == "basic" else 3
    for si, n in enumerate(cfg.layers):
        sp, ss = [], []
        for j in range(n):
            pre = f"layer{si + 1}.{j}."
            p, s = {}, {}
            for ci in range(1, n_convs + 1):
                p[f"c{ci}"], s[f"c{ci}"] = _c_cb(sd, pre + f"conv{ci}",
                                                 pre + f"bn{ci}")
            if pre + "downsample.0.weight" in sd:
                p["down"], s["down"] = _c_cb(sd, pre + "downsample.0",
                                             pre + "downsample.1")
            sp.append(p)
            ss.append(s)
        params["layers"].append(sp)
        state["layers"].append(ss)
    w = jnp.asarray(sd["fc.weight"]).T
    if w.shape[1] != num_classes:
        raise ValueError("fc class-count mismatch")
    params["fc"] = {"w": w, "b": jnp.asarray(sd["fc.bias"])}
    return params, state


def model_def(name: str) -> ModelDef:
    cfg = CONFIGS[name]
    feat = 512 * EXPANSION[cfg.block]

    def _init(key, num_classes=4, dtype=jnp.float32):
        return init(key, cfg, num_classes, dtype)

    def _apply(params, state, x, *, train=False, rng=None):
        return apply(params, state, x, cfg, train=train, rng=rng)

    return ModelDef(name=name, init=_init, apply=_apply,
                    input_size=(224, 224), feature_dim=feat,
                    convert_torch=lambda sd, num_classes=4: convert_torch(
                        sd, cfg, num_classes),
                    extras={"cfg": cfg, "bn_eps": 1e-5})
