"""Sequence parallelism: SP forward == single-device forward.

The oracle is the unsharded post-norm encoder path
(encoder_common.postnorm_layer) that every text tower uses; SP must be
numerics-identical (fp32 softmax both sides), including composed with
data parallelism on a data x seq mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garbage_classification_rca_tpu.models.text.encoder_common import (
    attention_bias, init_postnorm_layer, postnorm_layer)
from garbage_classification_rca_tpu.nn import core as nn
from garbage_classification_rca_tpu.parallel import mesh as pm
from garbage_classification_rca_tpu.parallel import sp

HIDDEN, FFN, HEADS, VOCAB, MAX_POS = 64, 128, 4, 211, 64
LN_EPS = 1e-12


def tiny_encoder(key, layers=2):
    ks = jax.random.split(key, layers + 2)
    return {
        "word_emb": nn.init_embedding(ks[0], VOCAB, HIDDEN),
        "pos_emb": nn.init_embedding(ks[1], MAX_POS, HIDDEN),
        "ln_emb": nn.init_layernorm(HIDDEN),
        "layers": [init_postnorm_layer(ks[2 + i], HIDDEN, FFN)
                   for i in range(layers)],
    }


def encode_oracle(params, ids, mask):
    h = nn.embedding(params["word_emb"], ids)
    h = h + nn.embedding(params["pos_emb"],
                         jnp.arange(ids.shape[1])[None, :])
    h = nn.layernorm(params["ln_emb"], h, eps=LN_EPS)
    bias = attention_bias(mask)
    for lp in params["layers"]:
        h = postnorm_layer(lp, h, bias, HEADS, LN_EPS)
    return h


def batch(rng, b, l):
    ids = rng.integers(0, VOCAB, (b, l)).astype(np.int32)
    mask = np.ones((b, l), np.int32)
    mask[0, -3:] = 0
    return jnp.asarray(ids), jnp.asarray(mask)


@pytest.mark.parametrize("mesh_spec,b,l", [
    ("seq:8", 3, 16),
    ("seq:4", 2, 32),
    ("data:2,seq:4", 4, 16),
])
def test_sp_encode_matches_single_device(mesh_spec, b, l):
    params = tiny_encoder(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids, mask = batch(rng, b, l)
    want = np.asarray(encode_oracle(params, ids, mask))

    mesh = pm.make_mesh(mesh_spec)
    got = np.asarray(jax.jit(
        lambda p, i, m: sp.postnorm_encode_sp(p, i, m, mesh, heads=HEADS,
                                              ln_eps=LN_EPS))(
        params, ids, mask))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_sp_rejects_indivisible_sequence():
    params = tiny_encoder(jax.random.PRNGKey(0))
    mesh = pm.make_mesh("seq:8")
    ids = jnp.ones((2, 12), jnp.int32)
    with pytest.raises(ValueError, match="does not divide"):
        sp.postnorm_encode_sp(params, ids, jnp.ones_like(ids), mesh,
                              heads=HEADS, ln_eps=LN_EPS)


def test_sp_distilbert_classifier_logits():
    """Full DistilBERT geometry (768 wide, 2 layers kept for CPU time):
    distilbert_classify_sp == distilbert.apply at eval."""
    from garbage_classification_rca_tpu.models.text import distilbert as db

    params, _ = db.init(jax.random.PRNGKey(3))
    params["encoder"]["layers"] = params["encoder"]["layers"][:2]
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, db.VOCAB, (2, 64)).astype(np.int32))
    mask = np.ones((2, 64), np.int32)
    mask[1, -10:] = 0
    mask = jnp.asarray(mask)

    want, _ = db.apply(params, {}, (ids, mask), train=False)
    mesh = pm.make_mesh("data:2,seq:4")
    got = jax.jit(lambda p, i, m: sp.distilbert_classify_sp(p, i, m, mesh))(
        params, ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_cli_eval_step_sp_matches_dp():
    """The test_text CLI's eval step with a seq-axis mesh must predict
    identically to the plain dp step (product wiring of SP, not just the
    library twin), and reject non-distilbert towers cleanly."""
    from garbage_classification_rca_tpu.cli.test_text import (
        make_text_eval_step)
    from garbage_classification_rca_tpu.models.text import distilbert as db

    params, _ = db.init(jax.random.PRNGKey(5))
    params["encoder"]["layers"] = params["encoder"]["layers"][:2]
    rng = np.random.default_rng(5)
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, db.VOCAB, (4, 16))
                                 .astype(np.int32)),
        "attention_mask": jnp.ones((4, 16), jnp.int32),
        "label": jnp.asarray(rng.integers(0, 4, (4,)).astype(np.int32)),
        "valid": jnp.ones((4,), jnp.int32),
    }
    dp = pm.make_mesh("data:2")
    spm = pm.make_mesh("data:2,seq:4")
    preds_dp, c_dp = make_text_eval_step(db.apply, dp,
                                         text_model="distilbert")(
        params, {}, batch)
    preds_sp, c_sp = make_text_eval_step(db.apply, spm,
                                         text_model="distilbert")(
        params, {}, batch)
    np.testing.assert_array_equal(np.asarray(preds_sp), np.asarray(preds_dp))
    assert int(c_sp) == int(c_dp)

    with pytest.raises(SystemExit):
        make_text_eval_step(db.apply, spm, text_model="bert")
