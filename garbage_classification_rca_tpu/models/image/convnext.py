"""ConvNeXt-Base (reference models.py:184-200: torchvision convnext_base
with classifier[2] replaced by Linear(1024, n)).

torchvision parity: patchify conv k4 s4 + LayerNorm2d; stages of CNBlocks
(dw conv 7x7 with bias -> LN(eps 1e-6) -> Linear C->4C -> GELU -> Linear
4C->C -> layer_scale * residual, stochastic depth train-only); LayerNorm2d
+ conv k2 s2 downsamples between stages; classifier = LayerNorm2d ->
flatten -> Linear. Widths (128, 256, 512, 1024), depths (3, 3, 27, 3).

NHWC bonus: torchvision permutes NCHW<->NHWC around the block MLP; we're
already channels-last so the block is permutation-free on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...nn import core as nn
from ..registry import ModelDef

WIDTHS = (128, 256, 512, 1024)
DEPTHS = (3, 3, 27, 3)
LN_EPS = 1e-6
SD_PROB = 0.5


def init(key, num_classes: int = 4, dtype=jnp.float32):
    params = {"stem_conv": None, "stem_ln": None, "stages": [],
              "downsamples": [], "ln_head": None, "fc": None}
    ks = jax.random.split(key, 6)
    params["stem_conv"] = nn.init_conv(ks[0], 4, 4, 3, WIDTHS[0], dtype=dtype,
                                       bias=True)
    params["stem_ln"] = nn.init_layernorm(WIDTHS[0], dtype)
    for si, (w, d) in enumerate(zip(WIDTHS, DEPTHS)):
        blocks = []
        for j in range(d):
            kb = jax.random.fold_in(key, si * 100 + j)
            k1, k2, k3 = jax.random.split(kb, 3)
            blocks.append({
                "dw": nn.init_conv(k1, 7, 7, w, w, groups=w, dtype=dtype, bias=True),
                "ln": nn.init_layernorm(w, dtype),
                "fc1": nn.init_linear(k2, w, 4 * w, dtype),
                "fc2": nn.init_linear(k3, 4 * w, w, dtype),
                "scale": jnp.full((w,), 1e-6, dtype),
            })
        params["stages"].append(blocks)
        if si < 3:
            kd = jax.random.fold_in(key, 9000 + si)
            params["downsamples"].append({
                "ln": nn.init_layernorm(w, dtype),
                "conv": nn.init_conv(kd, 2, 2, w, WIDTHS[si + 1], dtype=dtype,
                                     bias=True),
            })
    params["ln_head"] = nn.init_layernorm(WIDTHS[-1], dtype)
    params["fc"] = nn.init_linear(ks[1], WIDTHS[-1], num_classes, dtype)
    return params, {}


def apply(params, state, x, *, train=False, rng=None):
    h = nn.conv2d(params["stem_conv"], x, stride=4)
    h = nn.layernorm(params["stem_ln"], h, eps=LN_EPS)
    total = sum(DEPTHS)
    idx = 0
    for si in range(4):
        for j, p in enumerate(params["stages"][si]):
            y = nn.conv2d(p["dw"], h, padding=3, groups=h.shape[-1])
            y = nn.layernorm(p["ln"], y, eps=LN_EPS)
            y = nn.linear(p["fc2"], nn.gelu(nn.linear(p["fc1"], y)))
            y = y * p["scale"].astype(y.dtype)
            if train and rng is not None:
                y = nn.stochastic_depth(jax.random.fold_in(rng, idx), y,
                                        SD_PROB * idx / (total - 1), train)
            h = h + y
            idx += 1
        if si < 3:
            d = params["downsamples"][si]
            h = nn.layernorm(d["ln"], h, eps=LN_EPS)
            h = nn.conv2d(d["conv"], h, stride=2)
    pooled = nn.global_avg_pool(h)
    pooled = nn.layernorm(params["ln_head"], pooled, eps=LN_EPS)
    return nn.linear(params["fc"], pooled), state


def convert_torch(sd, num_classes: int = 4):
    """torchvision convnext_base layout: features.0 stem (conv, LN2d),
    odd features = stages of CNBlocks, even = downsamples (LN2d, conv);
    classifier.0 LN2d, classifier.2 Linear. The classifier LayerNorm is
    applied pre-pool in torchvision (on [B,C,1,1] after avgpool — i.e.
    post-pool on channels; identical either way)."""
    g = lambda k: jnp.asarray(sd[k])
    params = {
        "stem_conv": {"w": g("features.0.0.weight").transpose(2, 3, 1, 0),
                      "b": g("features.0.0.bias")},
        "stem_ln": {"scale": g("features.0.1.weight"), "bias": g("features.0.1.bias")},
        "stages": [], "downsamples": [],
    }
    for si in range(4):
        fi = 1 + 2 * si
        blocks = []
        for j in range(DEPTHS[si]):
            pre = f"features.{fi}.{j}."
            blocks.append({
                "dw": {"w": g(pre + "block.0.weight").transpose(2, 3, 1, 0),
                       "b": g(pre + "block.0.bias")},
                "ln": {"scale": g(pre + "block.2.weight"),
                       "bias": g(pre + "block.2.bias")},
                "fc1": {"w": g(pre + "block.3.weight").T,
                        "b": g(pre + "block.3.bias")},
                "fc2": {"w": g(pre + "block.5.weight").T,
                        "b": g(pre + "block.5.bias")},
                "scale": g(pre + "layer_scale").reshape(-1),
            })
        params["stages"].append(blocks)
        if si < 3:
            pre = f"features.{fi + 1}."
            params["downsamples"].append({
                "ln": {"scale": g(pre + "0.weight"), "bias": g(pre + "0.bias")},
                "conv": {"w": g(pre + "1.weight").transpose(2, 3, 1, 0),
                         "b": g(pre + "1.bias")},
            })
    params["ln_head"] = {"scale": g("classifier.0.weight"),
                         "bias": g("classifier.0.bias")}
    w = g("classifier.2.weight").T
    if w.shape[1] != num_classes:
        raise ValueError("classifier class-count mismatch")
    params["fc"] = {"w": w, "b": g("classifier.2.bias")}
    return params, {}


def model_def(name: str = "convnext") -> ModelDef:
    return ModelDef(name=name, init=init, apply=apply,
                    input_size=(224, 224), feature_dim=WIDTHS[-1],
                    convert_torch=convert_torch)
