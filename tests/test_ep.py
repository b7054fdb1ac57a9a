"""Expert parallelism: EP MoE FFN == single-device oracle.

The oracle is parallel/ep.py::moe_ffn (dense-dispatch top-k MoE); the
EP twin shards the expert bank over mesh axis 'expert' and must be
numerics-identical (the combine is a plain gated sum + psum), including
composed with data parallelism on a data x expert mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garbage_classification_rca_tpu.parallel import ep
from garbage_classification_rca_tpu.parallel import mesh as pm

D_MODEL, D_FFN = 32, 64


def batch(rng, b, t):
    return jnp.asarray(rng.standard_normal((b, t, D_MODEL)).astype(np.float32))


@pytest.mark.parametrize("mesh_spec,n_experts,top_k,b", [
    ("expert:8", 8, 2, 3),
    ("expert:4", 8, 1, 2),
    ("data:2,expert:4", 4, 2, 4),
])
def test_ep_matches_single_device(mesh_spec, n_experts, top_k, b):
    params = ep.init_moe_ffn(jax.random.PRNGKey(0), D_MODEL, D_FFN,
                             n_experts)
    x = batch(np.random.default_rng(0), b, 8)
    want = np.asarray(ep.moe_ffn(params, x, top_k=top_k))
    assert np.isfinite(want).all()

    mesh = pm.make_mesh(mesh_spec)
    sharded = ep.shard_moe_params(mesh, params)
    got = jax.jit(lambda p, xx: ep.moe_ffn_ep(p, xx, mesh, top_k=top_k)
                  )(sharded, x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5,
                               err_msg="ep: expert-sharded != oracle")


def test_gates_are_renormalized_topk():
    params = ep.init_moe_ffn(jax.random.PRNGKey(1), D_MODEL, D_FFN, 8)
    x = batch(np.random.default_rng(1), 2, 4)
    g = np.asarray(ep.moe_gates(params["router"], x, top_k=2))
    np.testing.assert_allclose(g.sum(-1), 1.0, rtol=1e-6)
    # at most top_k nonzero entries per token (ties aside on random data)
    assert ((g > 0).sum(-1) == 2).all()
    g1 = np.asarray(ep.moe_gates(params["router"], x, top_k=1))
    np.testing.assert_allclose(g1.max(-1), 1.0, rtol=1e-6)


def test_ep_rejects_indivisible_experts():
    params = ep.init_moe_ffn(jax.random.PRNGKey(2), D_MODEL, D_FFN, 6)
    mesh = pm.make_mesh("expert:4")
    x = batch(np.random.default_rng(2), 2, 4)
    with pytest.raises(ValueError, match="divide"):
        ep.moe_ffn_ep(ep.shard_moe_params(mesh, params), x, mesh)


def test_ep_grad_matches_single_device():
    """EP must also be trainable: grads of a scalar loss wrt the expert
    bank match the oracle's (the dryrun trains dp; EP covers its axis
    here)."""
    params = ep.init_moe_ffn(jax.random.PRNGKey(3), D_MODEL, D_FFN, 4)
    x = batch(np.random.default_rng(3), 2, 4)
    mesh = pm.make_mesh("expert:4")

    def loss_oracle(p):
        return jnp.sum(ep.moe_ffn(p, x, top_k=2) ** 2)

    def loss_ep(p):
        return jnp.sum(ep.moe_ffn_ep(p, x, mesh, top_k=2) ** 2)

    g_want = jax.grad(loss_oracle)(params)
    g_got = jax.grad(loss_ep)(ep.shard_moe_params(mesh, params))
    for k in ("fc1_w", "fc2_w", "router"):
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(g_got[k])[0]),
            np.asarray(jax.tree_util.tree_leaves(g_want[k])[0]),
            rtol=2e-4, atol=2e-5, err_msg=f"ep grad mismatch: {k}")
