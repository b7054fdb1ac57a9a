"""Model registry: name -> ModelDef, lazily imported."""

from __future__ import annotations

import importlib
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple


@dataclass(frozen=True)
class ModelDef:
    """A pure-functional model.

    apply signature: ``apply(params, state, batch, *, train=False, rng=None)
    -> (output, new_state)`` where ``batch`` is an image tensor (NHWC) for
    image models or ``(input_ids, attention_mask)`` for text models.
    """

    name: str
    init: Callable[..., Tuple[dict, dict]]
    apply: Callable[..., Tuple[Any, dict]]
    input_size: Tuple[int, int]              # (H, W); (0, 0) for text
    feature_dim: int                          # penultimate feature width
    convert_torch: Optional[Callable[..., Tuple[dict, dict]]] = None
    extras: Dict[str, Any] = field(default_factory=dict)


# name -> (module under models.image/..., attribute holding the ModelDef
# factory `model_def(name)`)
_IMAGE_MODULES = {
    "transformer_B16": ("garbage_classification_rca_tpu.models.image.vit", "model_def"),
    "transformer_L16": ("garbage_classification_rca_tpu.models.image.vit", "model_def"),
    "eff_v2_small": ("garbage_classification_rca_tpu.models.image.efficientnet_v2", "model_def"),
    "eff_v2_medium": ("garbage_classification_rca_tpu.models.image.efficientnet_v2", "model_def"),
    "eff_v2_large": ("garbage_classification_rca_tpu.models.image.efficientnet_v2", "model_def"),
    "b0": ("garbage_classification_rca_tpu.models.image.efficientnet", "model_def"),
    "b4": ("garbage_classification_rca_tpu.models.image.efficientnet", "model_def"),
    "b5": ("garbage_classification_rca_tpu.models.image.efficientnet", "model_def"),
    "res18": ("garbage_classification_rca_tpu.models.image.resnet", "model_def"),
    "res50": ("garbage_classification_rca_tpu.models.image.resnet", "model_def"),
    "res152": ("garbage_classification_rca_tpu.models.image.resnet", "model_def"),
    "convnext": ("garbage_classification_rca_tpu.models.image.convnext", "model_def"),
    "mb": ("garbage_classification_rca_tpu.models.image.mobilenet_v3", "model_def"),
    "shuffle_net": ("garbage_classification_rca_tpu.models.image.shufflenet_v2", "model_def"),
}

_TEXT_MODULES = {
    "distilbert": ("garbage_classification_rca_tpu.models.text.distilbert", "model_def"),
    "bert": ("garbage_classification_rca_tpu.models.text.bert", "model_def"),
    "roberta": ("garbage_classification_rca_tpu.models.text.roberta", "model_def"),
    "bart": ("garbage_classification_rca_tpu.models.text.bart", "model_def"),
    "gpt2": ("garbage_classification_rca_tpu.models.text.gpt2", "model_def"),
    "mobilebert": ("garbage_classification_rca_tpu.models.text.mobilebert", "model_def"),
    # reference CLI spelling (main_text.py:301)
    "mobile_bert": ("garbage_classification_rca_tpu.models.text.mobilebert", "model_def"),
}

IMAGE_MODELS = tuple(_IMAGE_MODULES)
TEXT_MODELS = tuple(_TEXT_MODULES)


def _load(table, name: str) -> ModelDef:
    if name not in table:
        raise KeyError(f"unknown model '{name}'; known: {sorted(table)}")
    mod_name, attr = table[name]
    mod = importlib.import_module(mod_name)
    return getattr(mod, attr)(name)


def get_image_model(name: str) -> ModelDef:
    return _load(_IMAGE_MODULES, name)


def get_text_model(name: str) -> ModelDef:
    return _load(_TEXT_MODULES, name)
