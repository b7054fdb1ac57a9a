"""Fused transformer-block kernels vs the unfused graph (+ VJP)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garbage_classification_rca_tpu.kernels import transformer_block as tb

RNG = np.random.default_rng(9)


def _mk(b=3, n=17, d=32, heads=4, ffn=64, dtype=np.float32):
    x = RNG.normal(size=(b, n, d)).astype(dtype)
    ls = RNG.normal(size=(d,)).astype(np.float32) * 0.1 + 1.0
    lb = RNG.normal(size=(d,)).astype(np.float32) * 0.1
    wqkv = (RNG.normal(size=(d, 3 * d)) * 0.1).astype(dtype)
    bqkv = (RNG.normal(size=(3 * d,)) * 0.1).astype(dtype)
    wout = (RNG.normal(size=(d, d)) * 0.1).astype(dtype)
    bout = (RNG.normal(size=(d,)) * 0.1).astype(dtype)
    w1 = (RNG.normal(size=(d, ffn)) * 0.1).astype(dtype)
    b1 = (RNG.normal(size=(ffn,)) * 0.1).astype(dtype)
    w2 = (RNG.normal(size=(ffn, d)) * 0.1).astype(dtype)
    b2 = (RNG.normal(size=(d,)) * 0.1).astype(dtype)
    j = jnp.asarray
    return (j(x), j(ls), j(lb), j(wqkv), j(bqkv), j(wout), j(bout),
            j(w1), j(b1), j(w2), j(b2))


def test_attn_block_matches_reference():
    x, ls, lb, wqkv, bqkv, wout, bout, *_ = _mk()
    got = tb.attn_block(x, ls, lb, wqkv, bqkv, wout, bout, heads=4)
    want = tb.attn_block_reference(x, ls, lb, wqkv, bqkv, wout, bout,
                                   heads=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_attn_block_tile_padding():
    x, ls, lb, wqkv, bqkv, wout, bout, *_ = _mk(b=5)
    got = tb.attn_block(x, ls, lb, wqkv, bqkv, wout, bout, heads=4, tile=2)
    want = tb.attn_block_reference(x, ls, lb, wqkv, bqkv, wout, bout,
                                   heads=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("act", ["gelu", "relu"])
def test_mlp_block_matches_reference(act):
    x, ls, lb, _, _, _, _, w1, b1, w2, b2 = _mk()
    got = tb.mlp_block(x, ls, lb, w1, b1, w2, b2, act=act)
    want = tb.mlp_block_reference(x, ls, lb, w1, b1, w2, b2, act=act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_block_kernels_reproduce_vit_layer():
    """attn_block + mlp_block == the unfused ViT encoder layer."""
    from garbage_classification_rca_tpu.models.image import vit

    cfg = vit.ViTConfig(image_size=32, patch_size=16, layers=1, heads=4,
                        hidden=64, mlp=128)
    params, _ = vit.init(jax.random.PRNGKey(0), cfg)
    lp = params["layers"][0]
    x = jnp.asarray(RNG.normal(size=(2, 5, 64)).astype(np.float32))

    import os
    os.environ["GC_RCA_FUSED_ATTN"] = "0"
    try:
        want = vit._encoder_layer(lp, x, cfg.heads, cfg.ln_eps)
    finally:
        os.environ.pop("GC_RCA_FUSED_ATTN")

    h = tb.attn_block(x, lp["ln_1"]["scale"], lp["ln_1"]["bias"],
                      lp["qkv"]["w"], lp["qkv"]["b"],
                      lp["out"]["w"], lp["out"]["b"],
                      heads=cfg.heads, eps=cfg.ln_eps)
    got = tb.mlp_block(h, lp["ln_2"]["scale"], lp["ln_2"]["bias"],
                       lp["fc1"]["w"], lp["fc1"]["b"],
                       lp["fc2"]["w"], lp["fc2"]["b"], eps=cfg.ln_eps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_trainable_blocks_grads_match_reference():
    x, ls, lb, wqkv, bqkv, wout, bout, w1, b1, w2, b2 = _mk(b=2, n=9)

    def loss_fused(x, wqkv, wout, w1, w2):
        h = tb.attn_block_trainable(x, ls, lb, wqkv, bqkv, wout, bout,
                                    heads=4)
        y = tb.mlp_block_trainable(h, ls, lb, w1, b1, w2, b2)
        return jnp.sum(y ** 2)

    def loss_ref(x, wqkv, wout, w1, w2):
        h = tb.attn_block_reference(x, ls, lb, wqkv, bqkv, wout, bout,
                                    heads=4)
        y = tb.mlp_block_reference(h, ls, lb, w1, b1, w2, b2)
        return jnp.sum(y ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, wqkv, wout, w1, w2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, wqkv, wout, w1, w2)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_postnorm_fused_layer_matches_unfused():
    """Round 5: the fully fused post-norm text layer (attn + mlp kernels,
    key mask, LN eps 1e-12, exact gelu) == encoder_common.postnorm_layer's
    unfused eval graph at the production DistilBERT geometry."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from garbage_classification_rca_tpu.kernels import transformer_block as tb
    from garbage_classification_rca_tpu.models.text.encoder_common import (
        attention_bias, init_postnorm_layer, postnorm_layer)

    rng = np.random.default_rng(5)
    for (b, n, d, ffn, heads) in ((3, 64, 768, 3072, 12),
                                  (2, 24, 96, 384, 4)):
        p = init_postnorm_layer(jax.random.PRNGKey(0), d, ffn)
        x = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32) * 0.5)
        m = np.ones((b, n), np.int32)
        m[0, -5:] = 0
        mask = jnp.asarray(m)

        # unfused oracle: mask=None keeps every fused branch off, the
        # additive bias carries the same key-validity information
        want = postnorm_layer(p, x, attention_bias(mask), heads, 1e-12,
                              mask=None)
        wqkv = jnp.concatenate([p["q"]["w"], p["k"]["w"], p["v"]["w"]], 1)
        bqkv = jnp.concatenate([p["q"]["b"], p["k"]["b"], p["v"]["b"]])
        h = tb.postnorm_attn_block(
            x, mask, wqkv, bqkv, p["out"]["w"], p["out"]["b"],
            p["ln_att"]["scale"], p["ln_att"]["bias"], heads=heads,
            eps=1e-12, interpret=True)
        got = tb.postnorm_mlp_block(
            h, p["fc1"]["w"], p["fc1"]["b"], p["fc2"]["w"], p["fc2"]["b"],
            p["ln_ffn"]["scale"], p["ln_ffn"]["bias"], eps=1e-12,
            act="gelu", interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-4, atol=3e-4)


def _spy_fused_blocks(monkeypatch):
    """Count postnorm_attn_block invocations through encoder_common's
    fused branch — the fits gate needs bf16 params (fp32 weights at
    768/3072 are 18.9 MB > the 14 MB cap, review r5: the first version
    of these tests silently compared the unfused path to itself)."""
    from garbage_classification_rca_tpu.models.text import encoder_common
    from garbage_classification_rca_tpu.kernels import transformer_block

    calls = {"n": 0}
    real = transformer_block.postnorm_attn_block

    def spy(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(
        encoder_common.transformer_block, "postnorm_attn_block", spy)
    return calls


def test_distilbert_eval_fused_block_path_matches_unfused(monkeypatch):
    """GC_RCA_FUSED_ATTN=1 routes the whole post-norm EVAL layer through
    the fused block kernels (bf16 params — the production eval dtype,
    and the one that passes the VMEM fits gate); tower outputs must
    match the unfused graph and the branch must ACTUALLY engage."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from garbage_classification_rca_tpu.models.text import distilbert as jd

    saved = jd.LAYERS
    jd.LAYERS = 2
    try:
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16),
            jd.init_encoder(jax.random.PRNGKey(0)))
        rng = np.random.default_rng(1)
        ids = jnp.asarray(rng.integers(5, 30000, (3, 16)).astype(np.int32))
        m = np.ones((3, 16), np.int32)
        m[1, -4:] = 0
        mask = jnp.asarray(m)

        monkeypatch.setenv("GC_RCA_FUSED_ATTN", "0")
        want = np.asarray(jd.encode(params, ids, mask), np.float32)
        calls = _spy_fused_blocks(monkeypatch)
        monkeypatch.setenv("GC_RCA_FUSED_ATTN", "1")
        got = np.asarray(jd.encode(params, ids, mask), np.float32)
        assert calls["n"] == 2, "fused-block branch did not engage"
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)
    finally:
        jd.LAYERS = saved


def test_bert_roberta_eval_fused_block_path_matches_unfused(monkeypatch):
    """BERT and RoBERTa share postnorm_layer, so the fused-block eval
    path engages for them too — tower outputs must match unfused."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from garbage_classification_rca_tpu.models.text import bert as jb
    from garbage_classification_rca_tpu.models.text import roberta as jr

    rng = np.random.default_rng(2)
    # both towers share bert's encoder layout; depth is read from the
    # params list, so a 2-layer bert-init encoder drives both encodes.
    # bf16 params: the fits gate (review r5) and the production dtype.
    for mod in (jb, jr):
        saved = jb.LAYERS
        jb.LAYERS = 2
        try:
            params = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16),
                jb.init_encoder(jax.random.PRNGKey(0)))
            ids = jnp.asarray(rng.integers(5, 20000, (2, 12)
                                           ).astype(np.int32))
            m = np.ones((2, 12), np.int32)
            m[0, -3:] = 0
            mask = jnp.asarray(m)
            monkeypatch.setenv("GC_RCA_FUSED_ATTN", "0")
            want = mod.encode(params, ids, mask)
            calls = _spy_fused_blocks(monkeypatch)
            monkeypatch.setenv("GC_RCA_FUSED_ATTN", "1")
            got = mod.encode(params, ids, mask)
            if isinstance(want, tuple):
                want, got = want[0], got[0]
            assert calls["n"] == 2, (mod.__name__,
                                     "fused-block branch did not engage")
            np.testing.assert_allclose(np.asarray(got, np.float32),
                                       np.asarray(want, np.float32),
                                       rtol=3e-2, atol=3e-2)
        finally:
            jb.LAYERS = saved
