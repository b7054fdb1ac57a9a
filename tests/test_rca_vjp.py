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


def test_rca_trainable_grads_match_pure_path():
    p = _params()
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.normal(size=(3, 16, 48)).astype(np.float32))
    i = jnp.asarray(rng.normal(size=(3, 16, 80)).astype(np.float32))

    def loss_fused(p, t, i):
        # interpret=True: Pallas interpreter on CPU for BOTH the fused
        # forward and the fused backward kernel
        ti, it = kf.rca_fused_trainable(p, t, i, True, True)
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


def test_fused_backward_kernel_matches_oracle_vjp():
    """rca_fused_bwd (the Pallas backward kernel) == jax.vjp of the pure
    graph, every weight grad + both input grads (VERDICT r1 item 6)."""
    p = _params()
    rng = np.random.default_rng(1)
    t = jnp.asarray(rng.normal(size=(5, 16, 48)).astype(np.float32))
    i = jnp.asarray(rng.normal(size=(5, 16, 80)).astype(np.float32))
    g_ti = jnp.asarray(rng.normal(size=(5, 16, 48)).astype(np.float32))
    g_it = jnp.asarray(rng.normal(size=(5, 16, 48)).astype(np.float32))

    for reverse in (True, False):
        _, vjp = jax.vjp(lambda p_, t_, i_: kf._oracle(p_, t_, i_, reverse),
                         p, t, i)
        want_p, want_t, want_i = vjp((g_ti, g_it))
        # tile=2 forces a padded tail + cross-tile weight-grad accumulation
        got_p, got_t, got_i = kf.rca_fused_bwd(p, t, i, g_ti, g_it,
                                               reverse=reverse, tile=2,
                                               interpret=True)
        np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                                   rtol=3e-5, atol=3e-5)
        np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                                   rtol=3e-5, atol=3e-5)
        for gw, gg in zip(jax.tree_util.tree_leaves(want_p),
                          jax.tree_util.tree_leaves(got_p)):
            np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                       rtol=5e-5, atol=5e-5)
