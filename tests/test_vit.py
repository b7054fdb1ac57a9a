"""ViT-B/16 parity vs a torchvision-layout torch replica (weight-load
fidelity, SURVEY.md §7 step 3: verify logits to ~1e-4)."""

import jax.numpy as jnp
import numpy as np
import torch

from garbage_classification_rca_tpu.checkpoint.torch_convert import numpy_state_dict
from garbage_classification_rca_tpu.models import get_image_model
from tests.torch_refs.vit_ref import VisionTransformerRef


def test_vit_b16_logits_match_torch():
    torch.manual_seed(0)
    # small image size to keep the test fast; same 12-layer B/16 geometry
    tref = VisionTransformerRef(image_size=64, patch=16, num_classes=4).eval()
    sd = numpy_state_dict(tref)

    mdef = get_image_model("transformer_B16")
    import dataclasses
    cfg = dataclasses.replace(mdef.extras["cfg"], image_size=64)
    from garbage_classification_rca_tpu.models.image import vit
    params, state = vit.convert_torch(sd, "transformer_B16", num_classes=4)

    x = np.random.default_rng(0).normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tref(torch.tensor(x)).numpy()
    got, _ = vit.apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       cfg=cfg)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_vit_init_and_apply_shapes():
    import jax
    mdef = get_image_model("transformer_B16")
    params, state = mdef.init(jax.random.PRNGKey(0), num_classes=4)
    x = jnp.zeros((2, 224, 224, 3), jnp.float32)
    out, _ = mdef.apply(params, state, x)
    assert out.shape == (2, 4)


def test_vit_head_class_mismatch_raises():
    torch.manual_seed(0)
    tref = VisionTransformerRef(image_size=64, patch=16, num_classes=7)
    sd = numpy_state_dict(tref)
    from garbage_classification_rca_tpu.models.image import vit
    import pytest
    with pytest.raises(ValueError):
        vit.convert_torch(sd, "transformer_B16", num_classes=4)
