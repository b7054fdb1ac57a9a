"""Inference-time BatchNorm folding: numerical identity with eval-mode BN."""

import jax
import jax.numpy as jnp
import numpy as np


def test_fold_batchnorm_identity():
    from garbage_classification_rca_tpu.models.image import (
        efficientnet_common as eff, efficientnet_v2 as effv2)

    cfg = effv2.CONFIGS["eff_v2_small"]
    params, state = eff.init(jax.random.PRNGKey(0), cfg, num_classes=4)
    rng = np.random.default_rng(0)
    state = jax.tree_util.tree_map(
        lambda a: a + 0.1 * rng.normal(size=a.shape).astype(np.float32)
        if a.ndim == 1 else a, state)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    want, _ = eff.apply(params, state, x, cfg)
    fp, fs = eff.fold_batchnorm(params, state, cfg)
    got, _ = eff.apply(fp, fs, x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # folded convs carry a bias, bn gone
    assert "b" in fp["stem"]["conv"] and "bn" not in fp["stem"]
