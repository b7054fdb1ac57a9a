"""Custom-VJP fused RCA: gradients match the pure-JAX path exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from garbage_classification_rca_tpu.ops import attention as att
from garbage_classification_rca_tpu.kernels import rca_fused as kf


def _params():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    return {
        "sa_txt": att.init_self_attention(ks[0], 48, 128, 96),
        "sa_img": att.init_self_attention(ks[1], 80, 128, 96),
        "rca_ti": att.init_cross_attention(ks[2], 96, 96, 64, 48),
        "rca_it": att.init_cross_attention(ks[3], 96, 96, 64, 48),
    }


def test_rca_trainable_grads_match_pure_path(monkeypatch):
    # on CPU route the fused forward through pallas interpret mode
    orig = kf.rca_fused
    monkeypatch.setattr(
        kf, "rca_fused",
        lambda p_, t_, i_, **kw: orig(p_, t_, i_, reverse=kw["reverse"],
                                      interpret=True))

    p = _params()
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.normal(size=(3, 16, 48)).astype(np.float32))
    i = jnp.asarray(rng.normal(size=(3, 16, 80)).astype(np.float32))

    def loss_fused(p, t, i):
        ti, it = kf.rca_fused_trainable(p, t, i, True)
        return jnp.sum(ti ** 2) + jnp.sum(it * 0.5)

    def loss_pure(p, t, i):
        ti, it = kf._oracle(p, t, i, True)
        return jnp.sum(ti ** 2) + jnp.sum(it * 0.5)

    want_l, want_g = jax.value_and_grad(loss_pure, argnums=(0, 1, 2))(p, t, i)
    got_l, got_g = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(p, t, i)

    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-5)
    for gw, gg in zip(jax.tree_util.tree_leaves(want_g),
                      jax.tree_util.tree_leaves(got_g)):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   rtol=2e-5, atol=2e-5)
