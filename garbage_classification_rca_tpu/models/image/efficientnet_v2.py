"""EfficientNetV2 S / M / L (reference models.py:9-66) + the multi-stage
feature extractor used by all fusion models (multimodal_model.py:11-36).

Arch names match the reference CLI: eff_v2_small / eff_v2_medium /
eff_v2_large. The extractor view returns (out_stage3, out_stage6,
pooled_1280) with the reference's indexing: its "stage3" is
torchvision features[4] (our stages[3]) and "stage6" features[7]
(our stages[6]) because its stem consumes features[:2].
"""

from __future__ import annotations

import jax.numpy as jnp

from ..registry import ModelDef
from . import efficientnet_common as eff

CONFIGS = {
    "eff_v2_small": eff.EffNetConfig(
        stages=(("fused", 1, 3, 1, 24, 24, 2), ("fused", 4, 3, 2, 24, 48, 4),
                ("fused", 4, 3, 2, 48, 64, 4), ("mb", 4, 3, 2, 64, 128, 6),
                ("mb", 6, 3, 1, 128, 160, 9), ("mb", 6, 3, 2, 160, 256, 15)),
        stem_out=24, head_out=1280, bn_eps=1e-3, dropout=0.2),
    "eff_v2_medium": eff.EffNetConfig(
        stages=(("fused", 1, 3, 1, 24, 24, 3), ("fused", 4, 3, 2, 24, 48, 5),
                ("fused", 4, 3, 2, 48, 80, 5), ("mb", 4, 3, 2, 80, 160, 7),
                ("mb", 6, 3, 1, 160, 176, 14), ("mb", 6, 3, 2, 176, 304, 18),
                ("mb", 6, 3, 1, 304, 512, 5)),
        stem_out=24, head_out=1280, bn_eps=1e-3, dropout=0.3),
    "eff_v2_large": eff.EffNetConfig(
        stages=(("fused", 1, 3, 1, 32, 32, 4), ("fused", 4, 3, 2, 32, 64, 7),
                ("fused", 4, 3, 2, 64, 96, 7), ("mb", 4, 3, 2, 96, 192, 10),
                ("mb", 6, 3, 1, 192, 224, 19), ("mb", 6, 3, 2, 224, 384, 25),
                ("mb", 6, 3, 1, 384, 640, 7)),
        stem_out=32, head_out=1280, bn_eps=1e-3, dropout=0.4),
}

INPUT_SIZES = {"eff_v2_small": (384, 384), "eff_v2_medium": (480, 480),
               "eff_v2_large": (480, 480)}


def extractor_features(params, state, x, cfg, *, train=False, rng=None):
    """(out_stage3, out_stage6, pooled) — multimodal_model.py:25-36 parity.

    Reference indices: out_stage3 = output of torchvision features[4]
    (stages[3] here), out_stage6 = features[7] (stages[6]).
    """
    stage_outs, pooled, new_state = eff.features_all_stages(
        params, state, x, cfg, train=train, rng=rng)
    return stage_outs[3], stage_outs[6], pooled, new_state


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
        extras={"cfg": cfg, "extractor_features": extractor_features,
                "bn_eps": cfg.bn_eps},
    )
