"""EfficientNet engine (v1 + v2) — MBConv / FusedMBConv over NHWC.

Backs reference models.py:9-124 (EffNetV2-L/M/S, EffNet-B0/B4/B5: stock
torchvision nets with classifier[1] replaced by Linear(feat, n)) and the
multi-stage feature extractor of the fusion family
(multimodal_model.py:11-36: stem=features[:2], stage1..6=features[2..7],
final_conv=features[8], returning (out_stage3, out_stage6, pooled_1280)).

Parity notes:
  * BN eps: v2 uses 1e-3; v1 b0/b4 the torch default 1e-5; b5 1e-3 with
    momentum 0.01 (torchvision _efficientnet_conf norm_layer overrides);
  * SE squeeze width = max(1, block_input_channels // 4), computed on the
    PRE-expansion channel count;
  * stochastic depth p ramps 0 -> 0.2 linearly over all blocks, active in
    train mode only;
  * depthwise convs map to feature_group_count = expanded channels (XLA
    lowers these to VPU-friendly per-channel convs).

State-dict converter consumes the torchvision key layout
(features.{i}.{j}.block.{k}.{0,1}.* / .fc1/.fc2, classifier.1.*).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...nn import core as nn

# stage row: (block_type, expand, kernel, stride, c_in, c_out, n_blocks)
Stage = Tuple[str, int, int, int, int, int, int]


@dataclass(frozen=True)
class EffNetConfig:
    stages: Tuple[Stage, ...]
    stem_out: int
    head_out: int
    bn_eps: float
    bn_momentum: float = 0.1
    dropout: float = 0.2
    sd_prob: float = 0.2


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def v1_stages(width: float, depth: float) -> Tuple[Stage, ...]:
    base = [(1, 3, 1, 32, 16, 1), (6, 3, 2, 16, 24, 2), (6, 5, 2, 24, 40, 2),
            (6, 3, 2, 40, 80, 3), (6, 5, 1, 80, 112, 3), (6, 5, 2, 112, 192, 4),
            (6, 3, 1, 192, 320, 1)]
    return tuple(("mb", e, k, s, _make_divisible(ci * width),
                  _make_divisible(co * width), math.ceil(n * depth))
                 for e, k, s, ci, co, n in base)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_cna(key, k, c_in, c_out, groups=1, dtype=jnp.float32):
    p_conv = nn.init_conv(key, k, k, c_in, c_out, groups=groups, dtype=dtype)
    p_bn, s_bn = nn.init_batchnorm(c_out, dtype)
    return {"conv": p_conv, "bn": p_bn}, {"bn": s_bn}


def init(key, cfg: EffNetConfig, num_classes: int = 4, dtype=jnp.float32):
    params: Dict = {"stem": None, "stages": [], "head": None, "classifier": None}
    state: Dict = {"stem": None, "stages": [], "head": None}
    k_stem, k_head, k_cls, key = jax.random.split(key, 4)
    params["stem"], state["stem"] = _init_cna(k_stem, 3, 3, cfg.stem_out,
                                              dtype=dtype)
    for si, (btype, expand, kernel, stride, c_in, c_out, n) in enumerate(cfg.stages):
        sp, ss = [], []
        for j in range(n):
            kb = jax.random.fold_in(key, si * 100 + j)
            ci = c_in if j == 0 else c_out
            bp, bs = _init_block(kb, btype, expand, kernel, ci, c_out, dtype)
            sp.append(bp)
            ss.append(bs)
        params["stages"].append(sp)
        state["stages"].append(ss)
    params["head"], state["head"] = _init_cna(k_head, 1, cfg.stages[-1][5],
                                              cfg.head_out, dtype=dtype)
    params["classifier"] = nn.init_linear(k_cls, cfg.head_out, num_classes, dtype)
    return params, state


def _init_block(key, btype, expand, kernel, c_in, c_out, dtype):
    ks = jax.random.split(key, 4)
    exp = c_in * expand
    p, s = {}, {}
    if btype == "fused":
        if expand != 1:
            p["expand"], s["expand"] = _init_cna(ks[0], kernel, c_in, exp, dtype=dtype)
            p["project"], s["project"] = _init_cna(ks[1], 1, exp, c_out, dtype=dtype)
        else:
            p["single"], s["single"] = _init_cna(ks[0], kernel, c_in, c_out, dtype=dtype)
    else:
        if expand != 1:
            p["expand"], s["expand"] = _init_cna(ks[0], 1, c_in, exp, dtype=dtype)
        p["dw"], s["dw"] = _init_cna(ks[1], kernel, exp, exp, groups=exp, dtype=dtype)
        sq = max(1, c_in // 4)
        p["se"] = {"fc1": nn.init_conv(ks[2], 1, 1, exp, sq, dtype=dtype, bias=True),
                   "fc2": nn.init_conv(ks[3], 1, 1, sq, exp, dtype=dtype, bias=True)}
        p["project"], s["project"] = _init_cna(ks[2], 1, exp, c_out, dtype=dtype)
    return p, s


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _cna(p, s, x, *, stride=1, groups=1, act=True, train=False,
         eps=1e-5, momentum=0.1):
    k = p["conv"]["w"].shape[0]
    pad = (k - 1) // 2
    y = nn.conv2d(p["conv"], x, stride=stride, padding=pad, groups=groups)
    if "bn" in p:          # absent after fold_batchnorm (eval-only path)
        y, new_bn = nn.batchnorm(p["bn"], s["bn"], y, train=train, eps=eps,
                                 momentum=momentum)
        new_s = {"bn": new_bn}
    else:
        new_s = {}
    if act:
        y = nn.silu(y)
    return y, new_s


def _se(p, x):
    s = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
    s = nn.silu(nn.conv2d(p["fc1"], s))
    s = nn.sigmoid(nn.conv2d(p["fc2"], s))
    return x * s


def _block(p, s, x, row: Stage, first: bool, *, eps, momentum, sd_rate,
           train, rng):
    btype, expand, kernel, stride, c_in, c_out, _ = row
    stride = stride if first else 1
    ci = x.shape[-1]
    use_res = stride == 1 and ci == c_out
    new_s = {}
    h = x
    if btype == "fused":
        if expand != 1:
            h, new_s["expand"] = _cna(p["expand"], s["expand"], h, stride=stride,
                                      train=train, eps=eps, momentum=momentum)
            h, new_s["project"] = _cna(p["project"], s["project"], h, act=False,
                                       train=train, eps=eps, momentum=momentum)
        else:
            h, new_s["single"] = _cna(p["single"], s["single"], h, stride=stride,
                                      train=train, eps=eps, momentum=momentum)
    else:
        if "expand" in p:
            h, new_s["expand"] = _cna(p["expand"], s["expand"], h, train=train,
                                      eps=eps, momentum=momentum)
        exp_c = h.shape[-1]
        h, new_s["dw"] = _cna(p["dw"], s["dw"], h, stride=stride, groups=exp_c,
                              train=train, eps=eps, momentum=momentum)
        h = _se(p["se"], h)
        h, new_s["project"] = _cna(p["project"], s["project"], h, act=False,
                                   train=train, eps=eps, momentum=momentum)
    if use_res:
        h = nn.stochastic_depth(rng, h, sd_rate, train)
        h = h + x
    return h, new_s


def features_all_stages(params, state, x, cfg: EffNetConfig, *,
                        train=False, rng=None):
    """Run the trunk; returns (list of per-stage outputs, pooled, new_state)."""
    eps, mom = cfg.bn_eps, cfg.bn_momentum
    total = sum(r[-1] for r in cfg.stages)
    new_state = {"stem": None, "stages": [], "head": None}
    h, new_state["stem"] = _cna(params["stem"], state["stem"], x, stride=2,
                                train=train, eps=eps, momentum=mom)
    idx = 0
    stage_outs = []
    for si, row in enumerate(cfg.stages):
        ss_new = []
        for j, (bp, bs) in enumerate(zip(params["stages"][si],
                                         state["stages"][si])):
            brng = None if rng is None else jax.random.fold_in(rng, si * 1000 + j)
            sd = cfg.sd_prob * idx / total
            h, bs_new = _block(bp, bs, h, row, j == 0, eps=eps, momentum=mom,
                               sd_rate=sd, train=train, rng=brng)
            ss_new.append(bs_new)
            idx += 1
        new_state["stages"].append(ss_new)
        stage_outs.append(h)
    h, new_state["head"] = _cna(params["head"], state["head"], h, train=train,
                                eps=eps, momentum=mom)
    pooled = nn.global_avg_pool(h)
    return stage_outs, pooled, new_state


def apply(params, state, x, cfg: EffNetConfig, *, train=False, rng=None,
          dropout_rate: Optional[float] = None):
    _, pooled, new_state = features_all_stages(params, state, x, cfg,
                                               train=train, rng=rng)
    rate = cfg.dropout if dropout_rate is None else dropout_rate
    if train and rng is not None:
        pooled = nn.dropout(jax.random.fold_in(rng, 999), pooled, rate, train)
    logits = nn.linear(params["classifier"], pooled)
    return logits, new_state


# ---------------------------------------------------------------------------
# inference-time BatchNorm folding
# ---------------------------------------------------------------------------


def fold_batchnorm(params, state, cfg: EffNetConfig):
    """Eval-only conv+BN folding (see nn/fold.py; -21% forward time on
    v5e for EffNetV2-M)."""
    from ...nn.fold import fold_batchnorm as _fold

    return _fold(params, state, cfg.bn_eps)


# ---------------------------------------------------------------------------
# torchvision state-dict conversion
# ---------------------------------------------------------------------------


def _c_cna(sd, pre):
    p = {"conv": {"w": jnp.asarray(sd[pre + ".0.weight"]).transpose(2, 3, 1, 0)},
         "bn": {"scale": jnp.asarray(sd[pre + ".1.weight"]),
                "bias": jnp.asarray(sd[pre + ".1.bias"])}}
    s = {"bn": {"mean": jnp.asarray(sd[pre + ".1.running_mean"]),
                "var": jnp.asarray(sd[pre + ".1.running_var"])}}
    return p, s


def convert_torch(sd, cfg: EffNetConfig, num_classes: int = 4,
                  expect_head: bool = True):
    params: Dict = {"stem": None, "stages": [], "head": None}
    state: Dict = {"stem": None, "stages": [], "head": None}
    params["stem"], state["stem"] = _c_cna(sd, "features.0")
    n_stages = len(cfg.stages)
    for si, row in enumerate(cfg.stages):
        btype, expand, _, _, c_in, c_out, n = row
        sp, ss = [], []
        for j in range(n):
            pre = f"features.{si + 1}.{j}.block"
            p, s = {}, {}
            if btype == "fused":
                if expand != 1:
                    p["expand"], s["expand"] = _c_cna(sd, pre + ".0")
                    p["project"], s["project"] = _c_cna(sd, pre + ".1")
                else:
                    p["single"], s["single"] = _c_cna(sd, pre + ".0")
            else:
                i = 0
                if expand != 1:
                    p["expand"], s["expand"] = _c_cna(sd, pre + f".{i}")
                    i += 1
                p["dw"], s["dw"] = _c_cna(sd, pre + f".{i}")
                i += 1
                p["se"] = {
                    "fc1": {"w": jnp.asarray(sd[pre + f".{i}.fc1.weight"]).transpose(2, 3, 1, 0),
                            "b": jnp.asarray(sd[pre + f".{i}.fc1.bias"])},
                    "fc2": {"w": jnp.asarray(sd[pre + f".{i}.fc2.weight"]).transpose(2, 3, 1, 0),
                            "b": jnp.asarray(sd[pre + f".{i}.fc2.bias"])},
                }
                i += 1
                p["project"], s["project"] = _c_cna(sd, pre + f".{i}")
            sp.append(p)
            ss.append(s)
        params["stages"].append(sp)
        state["stages"].append(ss)
    params["head"], state["head"] = _c_cna(sd, f"features.{n_stages + 1}")
    if expect_head and "classifier.1.weight" in sd:
        w = jnp.asarray(sd["classifier.1.weight"]).T
        if w.shape[1] != num_classes:
            raise ValueError(
                f"classifier has {w.shape[1]} classes, expected {num_classes}")
        params["classifier"] = {"w": w, "b": jnp.asarray(sd["classifier.1.bias"])}
    return params, state
