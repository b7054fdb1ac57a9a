"""Legacy fusion module (CVPR_code/models.py parity — structure/shape level;
the reference's own forward is broken, see legacy.py docstring)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_legacy_roberta_mbnet_forwards():
    from garbage_classification_rca_tpu.models.fusion import legacy

    params, state = legacy.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 50265, (2, 10)).astype(np.int32))
    mask = jnp.ones((2, 10), jnp.int32)
    imgs = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))

    out_c, st1 = legacy.forward_concat(params, state, (ids, mask, imgs))
    out_g, st2 = legacy.forward_gated(params, state, (ids, mask, imgs))
    assert out_c.shape == (2, 4) and out_g.shape == (2, 4)
    assert np.isfinite(np.asarray(out_c)).all()
    assert not np.allclose(np.asarray(out_c), np.asarray(out_g))
