"""Fused MHA Pallas kernel vs an independent einsum oracle (+ VJP)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garbage_classification_rca_tpu.kernels.mha_fused import (
    mha, mha_reference, mha_trainable)

RNG = np.random.default_rng(3)


def _oracle(q, k, v, heads, mask=None, causal=False):
    """Independent einsum implementation (numpy-ish, fp32 softmax)."""
    b, n, d = q.shape
    dh = d // heads
    qs = q.reshape(b, n, heads, dh).astype(np.float32)
    ks = k.reshape(b, n, heads, dh).astype(np.float32)
    vs = v.reshape(b, n, heads, dh).astype(np.float32)
    s = np.einsum("bnhd,bmhd->bhnm", qs, ks) / np.sqrt(dh)
    if mask is not None:
        s = np.where(mask[:, None, None, :] > 0, s, -1e30)
    if causal:
        tri = np.tril(np.ones((n, n), bool))
        s = np.where(tri[None, None], s, -1e30)
    s = s - s.max(-1, keepdims=True)
    e = np.exp(s)
    w = e / e.sum(-1, keepdims=True)
    o = np.einsum("bhnm,bmhd->bnhd", w, vs)
    return o.reshape(b, n, d)


@pytest.mark.parametrize("b,n,heads,dh", [
    (3, 197, 12, 64),    # ViT-B16 geometry
    (2, 64, 12, 64),     # text-tower bucket
    (1, 257, 16, 88),    # EVA ViT-g geometry (non-128 head dim)
])
def test_mha_matches_oracle(b, n, heads, dh):
    d = heads * dh
    q = RNG.normal(size=(b, n, d)).astype(np.float32)
    k = RNG.normal(size=(b, n, d)).astype(np.float32)
    v = RNG.normal(size=(b, n, d)).astype(np.float32)
    got = np.asarray(mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                         heads=heads))
    want = _oracle(q, k, v, heads)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    ref = np.asarray(mha_reference(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), heads=heads))
    np.testing.assert_allclose(ref, want, rtol=2e-4, atol=2e-5)


def test_mha_key_mask():
    b, n, heads, dh = 2, 33, 4, 16
    d = heads * dh
    q = RNG.normal(size=(b, n, d)).astype(np.float32)
    k = RNG.normal(size=(b, n, d)).astype(np.float32)
    v = RNG.normal(size=(b, n, d)).astype(np.float32)
    mask = np.ones((b, n), np.int32)
    mask[0, 20:] = 0
    mask[1, 5:] = 0
    got = np.asarray(mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                         heads=heads, mask=jnp.asarray(mask)))
    want = _oracle(q, k, v, heads, mask=mask)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_mha_causal():
    b, n, heads, dh = 2, 40, 4, 16
    d = heads * dh
    q = RNG.normal(size=(b, n, d)).astype(np.float32)
    k = RNG.normal(size=(b, n, d)).astype(np.float32)
    v = RNG.normal(size=(b, n, d)).astype(np.float32)
    mask = np.ones((b, n), np.int32)
    mask[1, 30:] = 0
    got = np.asarray(mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                         heads=heads, mask=jnp.asarray(mask), causal=True))
    want = _oracle(q, k, v, heads, mask=mask, causal=True)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_mha_batch_tile_padding():
    """b=5 with tile=2 forces a padded tail program."""
    b, n, heads, dh = 5, 17, 2, 8
    d = heads * dh
    q = RNG.normal(size=(b, n, d)).astype(np.float32)
    k = RNG.normal(size=(b, n, d)).astype(np.float32)
    v = RNG.normal(size=(b, n, d)).astype(np.float32)
    got = np.asarray(mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                         heads=heads, tile=2))
    np.testing.assert_allclose(got, _oracle(q, k, v, heads),
                               rtol=2e-4, atol=2e-5)


def test_mha_bf16_close_to_fp32():
    b, n, heads, dh = 2, 197, 12, 64
    d = heads * dh
    q = RNG.normal(size=(b, n, d)).astype(np.float32)
    k = RNG.normal(size=(b, n, d)).astype(np.float32)
    v = RNG.normal(size=(b, n, d)).astype(np.float32)
    got = np.asarray(mha(jnp.asarray(q, jnp.bfloat16),
                         jnp.asarray(k, jnp.bfloat16),
                         jnp.asarray(v, jnp.bfloat16),
                         heads=heads)).astype(np.float32)
    want = _oracle(q, k, v, heads)
    # bf16 inputs: ~2-3 decimal digits
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_vit_fused_path_matches_unfused(monkeypatch):
    """The ViT forward with the fused kernel (forced on via
    GC_RCA_FUSED_ATTN=1, interpreter on CPU) must match the unfused
    graph."""
    from garbage_classification_rca_tpu.models.image import vit

    cfg = vit.ViTConfig(image_size=32, patch_size=16, layers=2, heads=4,
                        hidden=64, mlp=128)
    params, state = vit.init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(RNG.normal(size=(2, 32, 32, 3)).astype(np.float32))

    monkeypatch.setenv("GC_RCA_FUSED_ATTN", "0")
    want, _ = vit.apply(params, state, x, cfg=cfg)
    monkeypatch.setenv("GC_RCA_FUSED_ATTN", "1")
    got, _ = vit.apply(params, state, x, cfg=cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=1e-5)


def test_distilbert_fused_path_matches_unfused(monkeypatch):
    """Masked encoder attention through the kernel == additive-bias graph."""
    from garbage_classification_rca_tpu.models.text import distilbert

    params, _ = distilbert.init(jax.random.PRNGKey(1))
    ids = jnp.asarray(RNG.integers(5, 1000, (2, 16)).astype(np.int32))
    mask = np.ones((2, 16), np.int32)
    mask[0, 10:] = 0
    mask = jnp.asarray(mask)

    monkeypatch.setenv("GC_RCA_FUSED_ATTN", "0")
    want = distilbert.encode(params["encoder"], ids, mask)
    monkeypatch.setenv("GC_RCA_FUSED_ATTN", "1")
    got = distilbert.encode(params["encoder"], ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_opt_fused_causal_path_matches_unfused(monkeypatch):
    from garbage_classification_rca_tpu.models.vlm import opt

    cfg = opt.OPTConfig(layers=2, hidden=64, heads=4, ffn=128, vocab=100)
    params = opt.init(jax.random.PRNGKey(2), cfg)
    ids = jnp.asarray(RNG.integers(4, 90, (2, 12)).astype(np.int32))
    mask = np.ones((2, 12), np.int32)
    mask[1, 8:] = 0
    mask = jnp.asarray(mask)
    emb = opt.embed_tokens(params, ids)

    monkeypatch.setenv("GC_RCA_FUSED_ATTN", "0")
    want = opt.decode(params, emb, mask, cfg)
    monkeypatch.setenv("GC_RCA_FUSED_ATTN", "1")
    got = opt.decode(params, emb, mask, cfg)
    # compare only valid positions (padded-query rows are unused garbage)
    vm = np.asarray(mask)[:, :, None]
    np.testing.assert_allclose(np.asarray(got) * vm, np.asarray(want) * vm,
                               rtol=2e-4, atol=2e-5)


def test_mha_trainable_grads_match_reference():
    b, n, heads, dh = 2, 19, 2, 8
    d = heads * dh
    q = jnp.asarray(RNG.normal(size=(b, n, d)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(b, n, d)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(b, n, d)).astype(np.float32))
    tgt = jnp.asarray(RNG.normal(size=(b, n, d)).astype(np.float32))

    def loss_fused(q, k, v):
        return jnp.sum((mha_trainable(q, k, v, heads=heads) - tgt) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum((mha_reference(q, k, v, heads=heads) - tgt) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mask_on,causal", [(False, False), (True, False),
                                            (True, True)])
def test_mha_flash_train_grads_match_reference(mask_on, causal):
    """Flash-backward kernel (GC_RCA_FLASH_BWD experiment, VERDICT r3
    weak #3): forward saves lse, backward recomputes scores tile-locally
    — dq/dk/dv must equal the XLA reference VJP."""
    from garbage_classification_rca_tpu.kernels.mha_fused import (
        mha_flash_train)

    b, n, heads, dh = 2, 13, 3, 8
    d = heads * dh
    q = jnp.asarray(RNG.normal(size=(b, n, d)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(b, n, d)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(b, n, d)).astype(np.float32))
    g = jnp.asarray(RNG.normal(size=(b, n, d)).astype(np.float32))
    mask = None
    if mask_on:
        m = np.ones((b, n), np.int32)
        m[0, -4:] = 0
        mask = jnp.asarray(m)

    want_o, vjp_r = jax.vjp(lambda q, k, v: mha_reference(
        q, k, v, heads=heads, mask=mask, causal=causal), q, k, v)
    got_o, vjp_f = jax.vjp(lambda q, k, v: mha_flash_train(
        q, k, v, heads=heads, mask=mask, causal=causal), q, k, v)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o),
                               rtol=1e-5, atol=1e-5)
    for a, b_ in zip(vjp_f(g), vjp_r(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=2e-5)


def test_vit_flash_train_path_matches_unfused(monkeypatch):
    """GC_RCA_FLASH_BWD=1 routes the ViT TRAIN forward through the flash
    kernel; train logits and input grads must match the unfused graph."""
    import dataclasses

    from garbage_classification_rca_tpu.models.image import vit

    cfg = dataclasses.replace(vit.CONFIGS["transformer_B16"],
                              image_size=32, layers=2)
    params, state = vit.init(jax.random.PRNGKey(0), cfg, num_classes=4)
    x = jnp.asarray(RNG.normal(size=(2, 32, 32, 3)).astype(np.float32))

    def loss(params):
        logits, _ = vit.apply(params, state, x, cfg=cfg, train=True,
                              rng=jax.random.PRNGKey(1))
        return jnp.sum(logits ** 2)

    monkeypatch.delenv("GC_RCA_FLASH_BWD", raising=False)
    want_l, want_g = jax.value_and_grad(loss)(params)
    monkeypatch.setenv("GC_RCA_FLASH_BWD", "1")
    got_l, got_g = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(got_g),
                     jax.tree_util.tree_leaves(want_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_text_and_opt_flash_train_paths_match_unfused(monkeypatch):
    """GC_RCA_FLASH_BWD=1 also routes the BERT-family and OPT TRAIN
    attention through the flash kernel (masked / masked+causal variants);
    outputs and grads must match the unfused graphs."""
    from garbage_classification_rca_tpu.models.text import distilbert as jd
    from garbage_classification_rca_tpu.models.vlm import opt

    saved = jd.LAYERS
    jd.LAYERS = 2
    try:
        dparams = jd.init_encoder(jax.random.PRNGKey(0))
        ids = jnp.asarray(RNG.integers(5, 30000, (2, 12)).astype(np.int32))
        m = np.ones((2, 12), np.int32)
        m[0, -3:] = 0
        mask = jnp.asarray(m)

        def d_loss(p):
            return jnp.sum(jd.encode(p, ids, mask, train=True) ** 2)

        monkeypatch.delenv("GC_RCA_FLASH_BWD", raising=False)
        want_l, want_g = jax.value_and_grad(d_loss)(dparams)
        monkeypatch.setenv("GC_RCA_FLASH_BWD", "1")
        got_l, got_g = jax.value_and_grad(d_loss)(dparams)
        np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-5)
        for a, b_ in zip(jax.tree_util.tree_leaves(got_g),
                         jax.tree_util.tree_leaves(want_g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-4)
    finally:
        jd.LAYERS = saved

    cfg = opt.OPTConfig(layers=2, hidden=64, heads=4, ffn=128, vocab=100)
    oparams = opt.init(jax.random.PRNGKey(2), cfg)
    emb = jnp.asarray(RNG.normal(size=(2, 10, 64)).astype(np.float32))
    om = np.ones((2, 10), np.int32)
    om[1, :3] = 0
    omask = jnp.asarray(om)

    def o_loss(p):
        h = opt.decode_hidden(p, emb, omask, cfg, train=True)
        return jnp.sum((h * omask[:, :, None]) ** 2)

    monkeypatch.delenv("GC_RCA_FLASH_BWD", raising=False)
    want_l, want_g = jax.value_and_grad(o_loss)(oparams)
    monkeypatch.setenv("GC_RCA_FLASH_BWD", "1")
    got_l, got_g = jax.value_and_grad(o_loss)(oparams)
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(got_g),
                     jax.tree_util.tree_leaves(want_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_opt_fused_prefill_matches_unfused(monkeypatch):
    """The serving prefill (opt.prefill -> layer_prefill) routes through
    the fused kernel too; hidden AND the cached K/V must be unchanged,
    and the greedy generate stream must be identical."""
    from garbage_classification_rca_tpu.models.vlm import opt

    cfg = opt.OPTConfig(layers=2, hidden=64, heads=4, ffn=128, vocab=100)
    params = opt.init(jax.random.PRNGKey(2), cfg)
    ids = jnp.asarray(RNG.integers(4, 90, (2, 12)).astype(np.int32))
    mask = np.ones((2, 12), np.int32)
    mask[1, :4] = 0            # LEFT-padded row (the production batcher)
    mask = jnp.asarray(mask)
    emb = opt.embed_tokens(params, ids)

    monkeypatch.setenv("GC_RCA_FUSED_ATTN", "0")
    want_h, want_c = opt.prefill(params, emb, mask, cfg, 3)
    want_t, want_v = opt.generate(params, emb, mask, cfg, max_new_tokens=3)
    monkeypatch.setenv("GC_RCA_FUSED_ATTN", "1")
    got_h, got_c = opt.prefill(params, emb, mask, cfg, 3)
    got_t, got_v = opt.generate(params, emb, mask, cfg, max_new_tokens=3)

    vm = np.asarray(mask)[:, :, None]
    np.testing.assert_allclose(np.asarray(got_h) * vm,
                               np.asarray(want_h) * vm,
                               rtol=2e-4, atol=2e-5)
    # caches are the pre-kernel projections — identical at every VALID
    # slot (pad-slot entries in layers >= 1 derive from the pad-row
    # garbage hidden, which legitimately differs between the fused and
    # unfused graphs; attention masks those slots either way)
    cm = np.pad(np.asarray(mask), ((0, 0), (0, 3)))[None, :, :, None]
    for key in ("k", "v"):
        np.testing.assert_array_equal(np.asarray(got_c[key]) * cm,
                                      np.asarray(want_c[key]) * cm)
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


def test_flash_train_dp_sharded_step_matches_single(monkeypatch):
    """ADVICE r4: flash_train_enabled() is the TPU train default, but no
    prior test exercised the flash fwd+bwd pallas_call inside a
    dp-sharded train jit. On the 8-virtual-device mesh (interpret mode),
    one full make_train_step (grad-accum scan included) with
    GC_RCA_FLASH_BWD=1 must produce the same params/loss dp-sharded as
    single-device, and the same as the XLA backward."""
    import dataclasses

    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from garbage_classification_rca_tpu.models.image import vit
    from garbage_classification_rca_tpu.train.loop import (
        make_train_step, microbatch_sharding)

    cfg = dataclasses.replace(vit.CONFIGS["transformer_B16"],
                              image_size=32, layers=2)
    params0, state0 = vit.init(jax.random.PRNGKey(0), cfg, num_classes=4)
    apply_fn = lambda p, s, x, train, rng: vit.apply(
        p, s, x, cfg=cfg, train=train, rng=rng)

    acc, b = 2, 16
    batch = {
        "image": RNG.integers(0, 255, (acc, b, 32, 32, 3)).astype(np.uint8),
        "label": RNG.integers(0, 4, (acc, b)).astype(np.int32),
        "valid": np.ones((acc, b), np.float32),
    }
    rng_step = jax.random.PRNGKey(7)

    def run(flash: str, mesh=None):
        monkeypatch.setenv("GC_RCA_FLASH_BWD", flash)
        step = make_train_step(apply_fn, optax.sgd(0.05),
                               compute_dtype=jnp.float32, mesh=mesh)
        opt_state = optax.sgd(0.05).init(params0)
        if mesh is None:
            bt = jax.device_put(batch)
            p, s, o = params0, state0, opt_state
        else:
            rep = NamedSharding(mesh, P())
            p, s, o = (jax.device_put(t, rep)
                       for t in (params0, state0, opt_state))
            bt = jax.device_put(batch, microbatch_sharding(mesh))
        p, s, o, loss, _ = step(p, s, o, bt, rng_step)
        return jax.device_get(p), float(loss)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    assert len(jax.devices()) == 8
    p_single, l_single = run("1")
    p_dp, l_dp = run("1", mesh)
    p_xla, l_xla = run("0", mesh)

    np.testing.assert_allclose(l_dp, l_single, rtol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(p_dp),
                     jax.tree_util.tree_leaves(p_single)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)
    # and the flash backward agrees with XLA's own VJP under the mesh
    np.testing.assert_allclose(l_dp, l_xla, rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(p_dp),
                     jax.tree_util.tree_leaves(p_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mask_on,causal", [(True, False), (True, True),
                                            (False, False)])
def test_mha_flash_train_dropout_matches_xla_same_mask(mask_on, causal):
    """VERDICT r4 weak #3: the dropout-fused flash kernels vs the XLA
    attention graph with nn.dropout on the SAME site key — identical
    bernoulli mask by construction, so outputs and q/k/v grads must agree
    to kernel-numerics tolerance."""
    from garbage_classification_rca_tpu.kernels.mha_fused import (
        mha_flash_train_dropout)
    from garbage_classification_rca_tpu.nn import core as nn

    b, n, heads, dh, p = 4, 24, 4, 16, 0.1
    d = heads * dh
    q = jnp.asarray(RNG.normal(size=(b, n, d)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(b, n, d)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(b, n, d)).astype(np.float32))
    key = jax.random.PRNGKey(11)
    mask = None
    if mask_on:
        m = np.ones((b, n), np.int32)
        m[0, -5:] = 0
        mask = jnp.asarray(m)

    def xla_loss(q, k, v):
        qh = q.reshape(b, n, heads, dh)
        kh = k.reshape(b, n, heads, dh)
        vh = v.reshape(b, n, heads, dh)
        s = jnp.einsum("bnhd,bmhd->bhnm", qh, kh,
                       preferred_element_type=jnp.float32) / np.sqrt(dh)
        if mask is not None:
            s = s + ((mask.astype(jnp.float32) - 1.0) * 1e30)[:, None,
                                                              None, :]
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
            s = jnp.where((col <= row)[None, None], s, -1e30)
        w = jax.nn.softmax(s, axis=-1).astype(vh.dtype)
        w = nn.dropout(key, w, p, True)        # the site's exact mask
        out = jnp.einsum("bhnm,bmhd->bnhd", w, vh).reshape(b, n, d)
        return jnp.sum(out ** 2), out

    def flash_loss(q, k, v):
        out = mha_flash_train_dropout(q, k, v, heads=heads, mask=mask,
                                      causal=causal, key=key, p=p)
        return jnp.sum(out ** 2), out

    (wl, wo), wg = jax.value_and_grad(xla_loss, (0, 1, 2),
                                      has_aux=True)(q, k, v)
    (gl, go), gg = jax.value_and_grad(flash_loss, (0, 1, 2),
                                      has_aux=True)(q, k, v)
    np.testing.assert_allclose(np.asarray(go), np.asarray(wo),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(gl), float(wl), rtol=1e-5)
    for a, b_ in zip(gg, wg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_distilbert_hf_dropout_flash_path_matches_xla(monkeypatch):
    """End-to-end: distilbert.encode under --hf_internal_dropout with the
    flash kernel (GC_RCA_FLASH_BWD=1) vs the XLA graph — the SAME
    HFDropout rng must give identical outputs and grads (the kernel draws
    the identical site mask), proving the site-stream accounting."""
    from garbage_classification_rca_tpu.models.text import distilbert as jd
    from garbage_classification_rca_tpu.nn import core as nn

    saved = jd.LAYERS
    jd.LAYERS = 2
    try:
        params = jd.init_encoder(jax.random.PRNGKey(0))
        ids = jnp.asarray(RNG.integers(5, 30000, (2, 12)).astype(np.int32))
        m = np.ones((2, 12), np.int32)
        m[0, -3:] = 0
        mask = jnp.asarray(m)
        rng = jax.random.PRNGKey(3)

        def loss(p):
            h = jd.encode(p, ids, mask, train=True, drop=nn.HFDropout(rng))
            return jnp.sum(h ** 2)

        monkeypatch.setenv("GC_RCA_FLASH_BWD", "0")
        want_l, want_g = jax.value_and_grad(loss)(params)
        monkeypatch.setenv("GC_RCA_FLASH_BWD", "1")
        got_l, got_g = jax.value_and_grad(loss)(params)
        np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-5)
        for a, b_ in zip(jax.tree_util.tree_leaves(got_g),
                         jax.tree_util.tree_leaves(want_g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-4)
    finally:
        jd.LAYERS = saved


def test_opt_hf_dropout_keeps_flash_path(monkeypatch):
    """OPT's attention_dropout is 0.0, so --hf_internal_dropout runs keep
    the flash backward (the probs site is identity and consumes no site
    counter) — flash on/off must agree under an ACTIVE HFDropout."""
    from garbage_classification_rca_tpu.models.vlm import opt
    from garbage_classification_rca_tpu.nn import core as nn

    cfg = opt.OPTConfig(layers=2, hidden=64, heads=4, ffn=128, vocab=100)
    params = opt.init(jax.random.PRNGKey(2), cfg)
    emb = jnp.asarray(RNG.normal(size=(2, 10, 64)).astype(np.float32))
    om = np.ones((2, 10), np.int32)
    om[1, :3] = 0
    omask = jnp.asarray(om)
    rng = jax.random.PRNGKey(5)

    def loss(p):
        h = opt.decode_hidden(p, emb, omask, cfg, train=True,
                              drop=nn.HFDropout(rng))
        return jnp.sum((h * omask[:, :, None]) ** 2)

    monkeypatch.setenv("GC_RCA_FLASH_BWD", "0")
    want_l, want_g = jax.value_and_grad(loss)(params)
    monkeypatch.setenv("GC_RCA_FLASH_BWD", "1")
    got_l, got_g = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(got_g),
                     jax.tree_util.tree_leaves(want_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_flash_vmem_gate_fp32_long_sequence():
    """Review r5: configs whose single-sample blocks exceed VMEM (fp32 /
    long sequences) must take the XLA fallback instead of handing Mosaic
    an unallocatable tile=1 kernel — and produce identical numerics."""
    from garbage_classification_rca_tpu.kernels.mha_fused import (
        flash_drop_fits, flash_train_fits, mha_flash_train, mha_reference)

    # real geometries: production configs keep the kernel...
    assert flash_train_fits((8, 197, 768), 12, 2)      # ViT-B16 bf16
    assert flash_train_fits((8, 257, 1408), 16, 2)     # EVA-g bf16
    assert flash_train_fits((8, 64, 768), 12, 4)       # text seq-64 fp32
    # ...fp32/long-sequence text training falls back
    assert not flash_train_fits((8, 512, 768), 12, 4)
    assert not flash_train_fits((8, 512, 768), 12, 2)  # bf16 bwd ~16.8 MB
    assert not flash_drop_fits((8, 384, 768), 12, 2)   # + mask buffers

    b, n, heads, dh = 2, 512, 12, 64
    d = heads * dh
    q = jnp.asarray(RNG.normal(size=(b, n, d)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(b, n, d)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(b, n, d)).astype(np.float32))
    m = np.ones((b, n), np.int32)
    m[0, -7:] = 0
    mask = jnp.asarray(m)
    got = mha_flash_train(q, k, v, heads=heads, mask=mask)   # fallback
    want = mha_reference(q, k, v, heads=heads, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    # and it is differentiable (the XLA VJP)
    g = jax.grad(lambda q: jnp.sum(mha_flash_train(
        q, k, v, heads=heads, mask=mask) ** 2))(q)
    assert bool(jnp.isfinite(g).all())
