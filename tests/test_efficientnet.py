"""EfficientNet v1/v2 parity vs the torchvision-layout torch replica."""

import numpy as np
import pytest
import torch

from garbage_classification_rca_tpu.checkpoint.torch_convert import numpy_state_dict
from tests.torch_refs.efficientnet_ref import (
    EfficientNetRef, V2_S_STAGES, V2_M_STAGES, V2_NORM, V1_NORM, v1_stages)


def _parity(tm, jcfg, size=64, rtol=2e-4, atol=2e-4, num_classes=4):
    import jax.numpy as jnp
    from garbage_classification_rca_tpu.models.image import efficientnet_common as eff

    tm = tm.eval()
    params, state = eff.convert_torch(numpy_state_dict(tm), jcfg, num_classes)
    x = np.random.default_rng(0).normal(size=(2, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x)).numpy()
    got, _ = eff.apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)), jcfg)
    np.testing.assert_allclose(np.asarray(got), want, rtol=rtol, atol=atol)


def test_effnet_v2_s_parity():
    from garbage_classification_rca_tpu.models.image.efficientnet_v2 import CONFIGS
    torch.manual_seed(0)
    tm = EfficientNetRef(V2_S_STAGES, 24, 1280, V2_NORM)
    # randomize BN stats so conversion of running stats is exercised
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
    _parity(tm, CONFIGS["eff_v2_small"], size=64, rtol=5e-3, atol=5e-3)


def test_effnet_b0_parity():
    from garbage_classification_rca_tpu.models.image.efficientnet import CONFIGS
    torch.manual_seed(1)
    tm = EfficientNetRef(v1_stages(1.0, 1.0), 32, 1280, V1_NORM)
    _parity(tm, CONFIGS["b0"], size=64, rtol=5e-3, atol=5e-3)


def test_v1_stage_tables_match_torch_replica():
    # b4 widths/depths
    from garbage_classification_rca_tpu.models.image.efficientnet import CONFIGS
    want = v1_stages(1.4, 1.8)
    got = CONFIGS["b4"].stages
    assert tuple(want) == tuple(got)
    assert CONFIGS["b4"].head_out == 1792
    assert CONFIGS["b5"].head_out == 2048


def test_effnet_v2_m_extractor_taps():
    """Extractor returns stage shapes matching multimodal_model.py:758-772
    expectations: stage3 [B,160,h/16,w/16]-ish, stage6 [B,512,...],
    pooled 1280."""
    import jax
    import jax.numpy as jnp
    from garbage_classification_rca_tpu.models.image.efficientnet_v2 import (
        CONFIGS, extractor_features)
    from garbage_classification_rca_tpu.models.image import efficientnet_common as eff

    cfg = CONFIGS["eff_v2_medium"]
    params, state = eff.init(jax.random.PRNGKey(0), cfg, num_classes=4)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    s3, s6, pooled, _ = extractor_features(params, state, x, cfg)
    assert s3.shape[-1] == 160
    assert s6.shape[-1] == 512
    assert pooled.shape == (1, 1280)
    # at 480 input (reference size): stage3 spatial 30, stage6 15
    # (downsampling x16 and x32) — verified via ratio at 128: 8 and 4
    assert s3.shape[1] == 8 and s6.shape[1] == 4


def test_effnet_bn_state_updates_in_train_mode():
    import jax
    import jax.numpy as jnp
    from garbage_classification_rca_tpu.models.image.efficientnet_v2 import CONFIGS
    from garbage_classification_rca_tpu.models.image import efficientnet_common as eff

    cfg = CONFIGS["eff_v2_small"]
    params, state = eff.init(jax.random.PRNGKey(0), cfg, num_classes=4)
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(2, 64, 64, 3)).astype(np.float32))
    _, new_state = eff.apply(params, state, x, cfg, train=True,
                             rng=jax.random.PRNGKey(1))
    before = np.asarray(state["stem"]["bn"]["mean"])
    after = np.asarray(new_state["stem"]["bn"]["mean"])
    assert not np.allclose(before, after)
    # eval mode leaves state untouched
    _, same_state = eff.apply(params, state, x, cfg, train=False)
    np.testing.assert_array_equal(np.asarray(same_state["stem"]["bn"]["mean"]),
                                  before)
