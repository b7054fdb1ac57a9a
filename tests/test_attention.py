"""RCA / self-attention math tests (SURVEY.md §4: RCA row-stochasticity,
equivalence vs a reference einsum)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garbage_classification_rca_tpu.ops import attention as att
from garbage_classification_rca_tpu.nn import core as nn


def _numpy_self_attention(p, x):
    """Independent numpy oracle for the reference math
    (multimodal_model.py:51-68)."""
    q = x @ np.asarray(p["q"]["w"]) + np.asarray(p["q"]["b"])
    k = x @ np.asarray(p["k"]["w"]) + np.asarray(p["k"]["b"])
    v = x @ np.asarray(p["v"]["w"]) + np.asarray(p["v"]["b"])
    scores = q @ np.swapaxes(k, -1, -2) / np.sqrt(q.shape[-1])
    w = np.exp(scores - scores.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    ctx = w @ v
    mean = ctx.mean(-1, keepdims=True)
    var = ctx.var(-1, keepdims=True)
    ln = (ctx - mean) / np.sqrt(var + 1e-5)
    ln = ln * np.asarray(p["norm"]["scale"]) + np.asarray(p["norm"]["bias"])
    return np.maximum(ln, 0.0)


def test_self_attention_matches_oracle():
    key = jax.random.PRNGKey(0)
    p = att.init_self_attention(key, 48, 128, 96)
    x = np.random.default_rng(1).normal(size=(2, 16, 48)).astype(np.float32)
    got = np.asarray(att.self_attention(p, jnp.asarray(x)))
    want = _numpy_self_attention(p, x)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("reverse", [False, True])
def test_rca_weights_row_stochastic(reverse):
    """(1-A)/(N-1) must keep rows summing to 1 (multimodal_model.py:95-99)."""
    n = 16
    a = jax.nn.softmax(jnp.asarray(
        np.random.default_rng(2).normal(size=(3, n, n))), axis=-1)
    w = (1.0 - a) / (n - 1) if reverse else a
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-6)
    assert (np.asarray(w) >= 0).all()


def test_rca_reverse_changes_output_and_matches_formula():
    key = jax.random.PRNGKey(3)
    p = att.init_cross_attention(key, 96, 96, 64, 48)
    rng = np.random.default_rng(4)
    xq = jnp.asarray(rng.normal(size=(2, 16, 96)).astype(np.float32))
    xkv = jnp.asarray(rng.normal(size=(2, 16, 96)).astype(np.float32))

    out_fwd = att.reverse_cross_attention(p, xq, xkv, reverse=False)
    out_rev = att.reverse_cross_attention(p, xq, xkv, reverse=True)
    assert not np.allclose(np.asarray(out_fwd), np.asarray(out_rev))

    # manual reverse computation
    q = np.asarray(nn.linear(p["q"], xq))
    k = np.asarray(nn.linear(p["k"], xkv))
    v = np.asarray(nn.linear(p["v"], xkv))
    scores = q @ np.swapaxes(k, -1, -2) / np.sqrt(64)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    a = e / e.sum(-1, keepdims=True)
    rw = (1.0 - a) / (16 - 1)
    ctx = rw @ v
    mean, var = ctx.mean(-1, keepdims=True), ctx.var(-1, keepdims=True)
    ln = (ctx - mean) / np.sqrt(var + 1e-5)
    ln = ln * np.asarray(p["norm"]["scale"]) + np.asarray(p["norm"]["bias"])
    want = np.maximum(ln, 0.0)
    np.testing.assert_allclose(np.asarray(out_rev), want, rtol=2e-5, atol=2e-5)


def test_rca_rejects_non_square():
    key = jax.random.PRNGKey(5)
    p = att.init_cross_attention(key, 8, 8, 8, 8)
    xq = jnp.zeros((1, 4, 8))
    xkv = jnp.zeros((1, 5, 8))
    with pytest.raises(ValueError):
        att.reverse_cross_attention(p, xq, xkv, reverse=True)
