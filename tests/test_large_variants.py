"""Shape smoke tests for the large zoo variants whose small siblings carry
the numerics parity tests (same code paths, different configs)."""

import jax
import jax.numpy as jnp
import pytest

from garbage_classification_rca_tpu.models import get_image_model


@pytest.mark.parametrize("name,size", [
    ("transformer_L16", 224),
    ("res152", 64),
    ("b4", 64),
    ("eff_v2_large", 64),
    ("convnext", 64),
])
def test_large_variant_init_and_forward(name, size):
    mdef = get_image_model(name)
    params, state = mdef.init(jax.random.PRNGKey(0), num_classes=4)
    out, _ = mdef.apply(params, state, jnp.zeros((1, size, size, 3),
                                                 jnp.float32))
    assert out.shape == (1, 4)


def test_b5_nonsquare_geometry():
    """b5 eval geometry is non-square (H456, W489) — forward must accept it."""
    mdef = get_image_model("b5")
    assert mdef.input_size == (456, 489)
    params, state = mdef.init(jax.random.PRNGKey(0), num_classes=4)
    out, _ = mdef.apply(params, state, jnp.zeros((1, 96, 128, 3), jnp.float32))
    assert out.shape == (1, 4)
