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


@pytest.mark.parametrize("strategy", ["MM_RCA", "classic", "normalized",
                                      "bimodal"])
def test_train_grads_finite_with_forced_image_drop(strategy):
    """Regression: modality dropout zeroing the IMAGE on randomly
    initialized towers (zero biases propagate the exact zero to the
    pooled feature) NaN'd every image-tower gradient — l2_normalize's
    old maximum(n, eps) clamp fixed the forward but left the 0/0 norm
    cotangent (0 * NaN = NaN). The double-where form must give finite
    grads (zero at the dropped modality)."""
    import jax.tree_util as tu

    from garbage_classification_rca_tpu.train.loss import (
        cross_entropy_loss_and_weight)

    cfg = FusionConfig(strategy=strategy, reverse=True,
                       image_or_text_dropout_chance=1.0,
                       img_prob_dropout=1.0)
    params, state = mm.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 30522, (2, 8)).astype(np.int32))
    mask = jnp.ones((2, 8), jnp.int32)
    imgs = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    labels = jnp.asarray([0, 1], jnp.int32)

    def loss_fn(p):
        out, _ = mm.forward(cfg, p, state, (ids, mask, imgs), train=True,
                            rng=jax.random.PRNGKey(1))
        loss, _ = cross_entropy_loss_and_weight(out, labels, None, 0.0,
                                                None)
        return loss

    grads = jax.grad(loss_fn)(params)
    for path, leaf in tu.tree_flatten_with_path(grads)[0]:
        assert np.isfinite(np.asarray(leaf, np.float32)).all(), \
            f"non-finite grad at {tu.keystr(path)}"
