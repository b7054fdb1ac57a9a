"""Tensor-parallel sharding of the OPT tower: TP output == single-device."""

import jax
import jax.numpy as jnp
import numpy as np

from garbage_classification_rca_tpu.models.vlm import opt as jopt
from garbage_classification_rca_tpu.parallel import mesh as pm
from garbage_classification_rca_tpu.parallel.tp import (opt_param_specs,
                                                        shard_with_specs)


def test_opt_tp_matches_single_device():
    cfg = jopt.OPTConfig(layers=2, hidden=64, heads=4, ffn=128, vocab=97,
                         max_pos=32)
    params = jopt.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 97, (4, 10)).astype(np.int32)
    mask = np.ones((4, 10), np.int32)
    mask[0, -3:] = 0

    embeds = jopt.embed_tokens(params, jnp.asarray(ids))
    want = np.asarray(jopt.decode(params, embeds, jnp.asarray(mask), cfg))

    mesh = pm.make_mesh("data:2,model:4")
    specs = opt_param_specs(params)
    sharded = shard_with_specs(mesh, params, specs)
    bs = pm.batch_sharding(mesh)

    @jax.jit
    def fwd(params, embeds, mask):
        return jopt.decode(params, embeds, mask, cfg)

    got = np.asarray(fwd(sharded,
                         jax.device_put(embeds, bs),
                         jax.device_put(jnp.asarray(mask), bs)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # the sharding must actually split the MLP kernel over 'model'
    fc1 = sharded["layers"][0]["fc1"]["w"]
    assert fc1.sharding.spec == jax.sharding.PartitionSpec(None, "model")
