"""EfficientNet (v1) B0 / B4 / B5 — reference models.py:69-124.

Width/depth-scaled stage tables via the standard compound-scaling rules
(width rounding to multiples of 8 with the 0.9 guard, depth = ceil).
BN overrides: b5 uses eps 1e-3 / momentum 0.01 (torchvision passes a
custom norm_layer for b5..b7); b0/b4 keep torch defaults.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..registry import ModelDef
from . import efficientnet_common as eff


def _v1_config(width, depth, dropout, bn_eps=1e-5, bn_momentum=0.1):
    head = eff._make_divisible(1280 * width) if width > 1.0 else 1280
    return eff.EffNetConfig(
        stages=eff.v1_stages(width, depth),
        stem_out=eff._make_divisible(32 * width),
        head_out=head, bn_eps=bn_eps, bn_momentum=bn_momentum,
        dropout=dropout)


CONFIGS = {
    "b0": _v1_config(1.0, 1.0, 0.2),
    "b4": _v1_config(1.4, 1.8, 0.4),
    "b5": _v1_config(1.6, 2.2, 0.4, bn_eps=1e-3, bn_momentum=0.01),
}

# (H, W) per config.IMAGE_ARCHS — reference eff_net_sizes stores (W, H)
INPUT_SIZES = {"b0": (224, 256), "b4": (380, 384), "b5": (456, 489)}


def model_def(name: str) -> ModelDef:
    cfg = CONFIGS[name]

    def _init(key, num_classes=4, dtype=jnp.float32):
        return eff.init(key, cfg, num_classes, dtype)

    def _apply(params, state, x, *, train=False, rng=None):
        return eff.apply(params, state, x, cfg, train=train, rng=rng)

    return ModelDef(
        name=name, init=_init, apply=_apply,
        input_size=INPUT_SIZES[name], feature_dim=cfg.head_out,
        convert_torch=lambda sd, num_classes=4: eff.convert_torch(
            sd, cfg, num_classes),
        extras={"cfg": cfg, "bn_eps": cfg.bn_eps},
    )
