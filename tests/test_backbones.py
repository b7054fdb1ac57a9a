"""ResNet / MobileNetV3 / ShuffleNetV2 / ConvNeXt parity vs torch replicas."""

import numpy as np
import pytest
import torch

from garbage_classification_rca_tpu.checkpoint.torch_convert import numpy_state_dict
from tests.torch_refs.misc_backbones_ref import (
    BasicBlock, Bottleneck, ResNetRef, MobileNetV3Ref, ShuffleNetV2Ref,
    ConvNeXtRef)


def _randomize_bn(tm):
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)


def _check(tm, convert, apply, size=64, rtol=2e-3, atol=2e-3, seed=0):
    import jax.numpy as jnp
    tm = tm.eval()
    _randomize_bn(tm)
    params, state = convert(numpy_state_dict(tm), 4)
    x = np.random.default_rng(seed).normal(size=(2, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x)).numpy()
    got, _ = apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=rtol, atol=atol)


def test_resnet18_parity():
    from garbage_classification_rca_tpu.models.image import resnet
    torch.manual_seed(0)
    tm = ResNetRef(BasicBlock, (2, 2, 2, 2))
    cfg = resnet.CONFIGS["res18"]
    _check(tm, lambda sd, n: resnet.convert_torch(sd, cfg, n),
           lambda p, s, x: resnet.apply(p, s, x, cfg))


def test_resnet50_parity():
    from garbage_classification_rca_tpu.models.image import resnet
    torch.manual_seed(1)
    tm = ResNetRef(Bottleneck, (3, 4, 6, 3))
    cfg = resnet.CONFIGS["res50"]
    _check(tm, lambda sd, n: resnet.convert_torch(sd, cfg, n),
           lambda p, s, x: resnet.apply(p, s, x, cfg))


def test_mobilenet_v3_parity():
    from garbage_classification_rca_tpu.models.image import mobilenet_v3 as mb
    torch.manual_seed(2)
    tm = MobileNetV3Ref()
    _check(tm, mb.convert_torch, mb.apply)


def test_shufflenet_v2_parity():
    from garbage_classification_rca_tpu.models.image import shufflenet_v2 as sh
    torch.manual_seed(3)
    tm = ShuffleNetV2Ref()
    _check(tm, sh.convert_torch, sh.apply)


def test_convnext_parity():
    from garbage_classification_rca_tpu.models.image import convnext as cx
    torch.manual_seed(4)
    # reduced depths for speed; widths kept 4-stage
    tm = ConvNeXtRef(widths=(64, 128, 256, 512), depths=(2, 2, 4, 2))
    saved = (cx.WIDTHS, cx.DEPTHS)
    cx.WIDTHS, cx.DEPTHS = (64, 128, 256, 512), (2, 2, 4, 2)
    try:
        _check(tm, cx.convert_torch, cx.apply)
    finally:
        cx.WIDTHS, cx.DEPTHS = saved


def test_registry_builds_all_image_models():
    import jax
    import jax.numpy as jnp
    from garbage_classification_rca_tpu.models import get_image_model, IMAGE_MODELS
    for name in IMAGE_MODELS:
        mdef = get_image_model(name)
        assert mdef.input_size[0] > 0
        # init smoke-test for the light ones only (others covered above)
        if name in ("res18", "shuffle_net", "mb"):
            params, state = mdef.init(jax.random.PRNGKey(0), num_classes=4)
            out, _ = mdef.apply(params, state,
                                jnp.zeros((1, 64, 64, 3), jnp.float32))
            assert out.shape == (1, 4)
