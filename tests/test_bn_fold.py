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


def test_fold_batchnorm_with_conv_bias():
    """Generic {conv,bn} folding when the conv already has a bias: the bias
    must be scaled through BN (b' = beta + (b - mean)*scale), not added raw
    (ADVICE r1)."""
    from garbage_classification_rca_tpu.nn.fold import fold_batchnorm

    rng = np.random.default_rng(1)
    cout = 8
    w = rng.normal(size=(3, 3, 4, cout)).astype(np.float32)
    b = rng.normal(size=(cout,)).astype(np.float32)
    gamma = rng.normal(size=(cout,)).astype(np.float32)
    beta = rng.normal(size=(cout,)).astype(np.float32)
    mean = rng.normal(size=(cout,)).astype(np.float32)
    var = rng.uniform(0.5, 2.0, size=(cout,)).astype(np.float32)
    eps = 1e-5

    params = {"layer": {"conv": {"w": jnp.asarray(w), "b": jnp.asarray(b)},
                        "bn": {"scale": jnp.asarray(gamma),
                               "bias": jnp.asarray(beta)}}}
    state = {"layer": {"bn": {"mean": jnp.asarray(mean),
                              "var": jnp.asarray(var)}}}
    fp, _ = fold_batchnorm(params, state, eps)

    x = jnp.asarray(rng.normal(size=(2, 6, 6, 4)).astype(np.float32))
    conv = lambda w_: jax.lax.conv_general_dilated(
        x, w_, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    want = (conv(jnp.asarray(w)) + b - mean) / np.sqrt(var + eps) * gamma + beta
    got = conv(fp["layer"]["conv"]["w"]) + fp["layer"]["conv"]["b"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
