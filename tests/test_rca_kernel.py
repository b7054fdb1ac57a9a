"""Pallas fused MM-RCA kernel vs the pure-JAX oracle (interpret mode on CPU;
the driver's TPU bench exercises the compiled path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garbage_classification_rca_tpu.ops import attention as att
from garbage_classification_rca_tpu.kernels.rca_fused import rca_fused


@pytest.fixture(scope="module")
def block_params():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    return {
        "sa_txt": att.init_self_attention(ks[0], 48, 128, 96),
        "sa_img": att.init_self_attention(ks[1], 80, 128, 96),
        "rca_ti": att.init_cross_attention(ks[2], 96, 96, 64, 48),
        "rca_it": att.init_cross_attention(ks[3], 96, 96, 64, 48),
    }


def _oracle(p, t, i, reverse):
    t_sa = att.self_attention(p["sa_txt"], t)
    i_sa = att.self_attention(p["sa_img"], i)
    ti = att.reverse_cross_attention(p["rca_ti"], t_sa, i_sa, reverse)
    it = att.reverse_cross_attention(p["rca_it"], i_sa, t_sa, reverse)
    return ti, it


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("batch", [8, 13])   # 13 exercises tile padding
def test_rca_fused_matches_oracle(block_params, reverse, batch):
    rng = np.random.default_rng(1)
    t = jnp.asarray(rng.normal(size=(batch, 16, 48)).astype(np.float32))
    i = jnp.asarray(rng.normal(size=(batch, 16, 80)).astype(np.float32))
    want_ti, want_it = _oracle(block_params, t, i, reverse)
    got_ti, got_it = rca_fused(block_params, t, i, reverse=reverse,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got_ti), np.asarray(want_ti),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_it), np.asarray(want_it),
                               rtol=2e-5, atol=2e-5)


def test_fusion_forward_with_pallas_flag(block_params):
    """use_pallas_rca=True must agree with the default path end-to-end
    through mm_rca_block."""
    from garbage_classification_rca_tpu.models.fusion import multimodal as mm
    from garbage_classification_rca_tpu.models.fusion import FusionConfig

    rng = np.random.default_rng(2)
    img_feat = jnp.asarray(rng.normal(size=(4, 1280)).astype(np.float32))
    txt_feat = jnp.asarray(rng.normal(size=(4, 768)).astype(np.float32))
    cfg0 = FusionConfig(strategy="MM_RCA", reverse=True, use_pallas_rca=False)
    cfg1 = FusionConfig(strategy="MM_RCA", reverse=True, use_pallas_rca=True)
    a = mm.mm_rca_block(cfg0, block_params, img_feat, txt_feat)
    b = mm.mm_rca_block(cfg1, block_params, img_feat, txt_feat)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-5, atol=2e-5)
