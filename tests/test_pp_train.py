"""GPipe TRAINING (parallel/pp.py pp_lm_loss / make_pp_train_step) on the
8-virtual-device CPU mesh: the pipelined backward (jax.grad through
scan+ppermute) must reproduce single-device large-batch training exactly —
loss, grads, and optimizer updates, for full fine-tune and for the
reference's LoRA recipe (blip_2_training.py:210-229), with and without
remat, composed with dp."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from garbage_classification_rca_tpu.models.vlm import opt
from garbage_classification_rca_tpu.parallel import pp
from garbage_classification_rca_tpu.parallel.mesh import make_mesh


def _tiny_opt():
    cfg = opt.OPTConfig(layers=4, hidden=64, heads=4, ffn=128, vocab=200,
                        max_pos=64)
    params = opt.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _batch(cfg, b=4, l=7, seed=1):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(b, l, cfg.hidden)).astype(np.float32)
    mask = np.ones((b, l), np.int32)
    mask[0, -3:] = 0
    mask[2, -1:] = 0
    labels = rng.integers(0, cfg.vocab, size=(b, l)).astype(np.int32)
    labels[mask == 0] = -100                     # pads ignored
    labels[:, :2] = -100                         # "prompt" segment ignored
    return {"inputs_embeds": jnp.asarray(emb),
            "attention_mask": jnp.asarray(mask),
            "labels": jnp.asarray(labels)}


def _tiny_lora(cfg, r=2, seed=3):
    rng = np.random.default_rng(seed)
    return {str(i): {name: {
        "a": jnp.asarray(rng.normal(size=(cfg.hidden, r)).astype(np.float32)
                         / np.sqrt(r)),
        "b": jnp.asarray(rng.normal(size=(r, cfg.hidden))
                         .astype(np.float32) * 0.1)}
        for name in ("q", "k")} for i in range(cfg.layers)}


def _loss_1dev(params, batch, cfg, lora=None, lora_scale=1.0):
    """Single-device oracle: same shifted-CE math on opt.decode_hidden."""
    h = opt.decode_hidden(params, batch["inputs_embeds"],
                          batch["attention_mask"], cfg, lora=lora,
                          lora_scale=lora_scale, train=True)
    logits = opt.lm_head(params, h)
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = batch["labels"][:, 1:]
    valid = (shift_labels != -100)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    picked = jnp.take_along_axis(
        logp, jnp.clip(shift_labels, 0)[..., None], axis=-1)[..., 0]
    return -(picked * valid).sum() / jnp.maximum(valid.sum(), 1)


def _head(params):
    return {k: params[k] for k in
            ("embed_tokens", "embed_positions", "final_ln")}


def _assert_trees_close(got, want, rtol=5e-4, atol=5e-4, msg=""):
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=atol,
            err_msg=msg), got, want)


@pytest.mark.parametrize("remat", [False, True])
def test_pp_lm_loss_matches_single_device(remat):
    cfg, params = _tiny_opt()
    batch = _batch(cfg)
    want = _loss_1dev(params, batch, cfg)

    mesh = make_mesh("pipe:4")
    stacked = pp.shard_pipeline_params(
        mesh, pp.stack_pipeline_params(params["layers"], 4))
    got = pp.pp_lm_loss(_head(params), stacked, batch["inputs_embeds"],
                        batch["attention_mask"], batch["labels"], cfg,
                        mesh, n_microbatches=2, remat=remat)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-5)


def test_pp_train_step_full_ft_matches_single_device():
    """One AdamW step of the full fine-tune: loss, stage-layer updates and
    head updates must equal single-device large-batch training (grads are
    exact under GPipe microbatch accumulation, not an approximation)."""
    cfg, params = _tiny_opt()
    batch = _batch(cfg)
    tx = optax.adamw(1e-3)

    # single-device twin FIRST (the pp step donates its trainable
    # buffers, which alias params' head arrays): same tx over the SAME
    # tree layout (layers restacked), so the only difference under test
    # is the pipeline
    def loss_1(tr, batch):
        full = dict(params)
        full.update(tr["head"])
        full["layers"] = tr["layers"]
        return _loss_1dev(full, batch, cfg)

    tr1 = {"head": _head(params), "layers": params["layers"]}
    loss1, g1 = jax.value_and_grad(loss_1)(tr1, batch)
    g1 = {"head": g1["head"],
          "stages": pp.stack_pipeline_params(g1["layers"], 4)}
    tr1s = {"head": tr1["head"],
            "stages": pp.stack_pipeline_params(tr1["layers"], 4)}
    upd, _ = tx.update(g1, tx.init(tr1s), tr1s)
    want = optax.apply_updates(tr1s, upd)

    mesh = make_mesh("pipe:4")
    stacked = pp.shard_pipeline_params(
        mesh, pp.stack_pipeline_params(params["layers"], 4))
    # donated trainable must not alias params (the oracle and other
    # tests keep using them) — hand the step its own copies
    trainable = jax.tree_util.tree_map(
        jnp.array, {"head": _head(params), "stages": stacked})
    opt_state = tx.init(trainable)
    step = pp.make_pp_train_step(tx, cfg, mesh, n_microbatches=2)
    new_train, _, loss = step(trainable, {}, opt_state, batch)

    np.testing.assert_allclose(float(loss), float(loss1), rtol=2e-5)
    # Adam's first-step update is lr*g/(|g|+eps): coordinates whose grad
    # sits near fp-reduction noise amplify ordering differences to
    # O(lr)*noise/|g| — measured max 1.2e-5 vs the 1e-3 update magnitude
    _assert_trees_close(new_train, want, rtol=1e-3, atol=5e-5,
                        msg="pp train step != single-device")


def test_pp_train_step_lora_matches_single_device():
    """The reference's LoRA recipe over the pipeline: base weights frozen
    (and untouched), only stage-stacked adapters update; grads equal the
    single-device lora grads (opt._apply_lora path)."""
    cfg, params = _tiny_opt()
    batch = _batch(cfg)
    lora = _tiny_lora(cfg)
    scale = 0.25                                 # lora_alpha/r-style scale
    tx = optax.adamw(5e-4)                       # blip_2_training.py:228

    mesh = make_mesh("pipe:4")
    stacked = pp.shard_pipeline_params(
        mesh, pp.stack_pipeline_params(params["layers"], 4))
    stacked_lora = pp.shard_pipeline_params(
        mesh, pp.stack_pipeline_lora(lora, cfg.layers, 4))
    trainable = {"lora": stacked_lora}
    frozen = {"head": _head(params), "stages": stacked}
    opt_state = tx.init(trainable)
    step = pp.make_pp_train_step(tx, cfg, mesh, n_microbatches=2,
                                 lora_scale=scale)
    new_train, _, loss = step(trainable, frozen, opt_state, batch)

    def loss_1(lo, batch):
        return _loss_1dev(params, batch, cfg, lora=lo, lora_scale=scale)

    loss1, g1 = jax.value_and_grad(loss_1)(lora, batch)
    g1s = {"lora": pp.stack_pipeline_lora(g1, cfg.layers, 4)}
    tr1 = {"lora": pp.stack_pipeline_lora(lora, cfg.layers, 4)}
    upd, _ = tx.update(g1s, tx.init(tr1), tr1)
    want = optax.apply_updates(tr1, upd)

    np.testing.assert_allclose(float(loss), float(loss1), rtol=2e-5)
    # same Adam noise-amplification bound as the full-FT test above
    _assert_trees_close(new_train, want, rtol=1e-3, atol=5e-5,
                        msg="pp lora step != single-device")


def test_pp_train_composes_with_dp():
    """dp x pp training: on data:2,pipe:4 each data shard pipelines its
    half of the batch; the combined grads still equal single-device."""
    cfg, params = _tiny_opt()
    batch = _batch(cfg)
    mesh = make_mesh("data:2,pipe:4")
    stacked = pp.shard_pipeline_params(
        mesh, pp.stack_pipeline_params(params["layers"], 4))

    def loss_pp(stages, batch):
        return pp.pp_lm_loss(_head(params), stages,
                             batch["inputs_embeds"],
                             batch["attention_mask"], batch["labels"],
                             cfg, mesh, n_microbatches=2, remat=True)

    got = jax.jit(jax.grad(loss_pp))(stacked, batch)

    def loss_1(layers, batch):
        full = dict(params)
        full["layers"] = layers
        return _loss_1dev(full, batch, cfg)

    want = pp.stack_pipeline_params(
        jax.grad(loss_1)(params["layers"], batch), 4)
    _assert_trees_close(got, want, msg="dp x pp grads != single-device")


def test_pp_decode_honors_lora():
    """Eval of a LoRA-tuned model through the pipeline: pp_decode with
    stage_lora must equal the single-device lora logits (and differ from
    the base-weights logits — the adapters actually apply)."""
    cfg, params = _tiny_opt()
    batch = _batch(cfg)
    lora = _tiny_lora(cfg)
    want = opt.decode(params, batch["inputs_embeds"],
                      batch["attention_mask"], cfg, lora=lora,
                      lora_scale=0.5)
    base = opt.decode(params, batch["inputs_embeds"],
                      batch["attention_mask"], cfg)
    assert float(jnp.abs(want - base).max()) > 1e-3

    mesh = make_mesh("pipe:4")
    stacked = pp.shard_pipeline_params(
        mesh, pp.stack_pipeline_params(params["layers"], 4))
    stacked_lora = pp.shard_pipeline_params(
        mesh, pp.stack_pipeline_lora(lora, cfg.layers, 4))
    got = pp.pp_decode(params, stacked, batch["inputs_embeds"],
                       batch["attention_mask"], cfg, mesh,
                       n_microbatches=2, stage_lora=stacked_lora,
                       lora_scale=0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5,
                               err_msg="pp_decode lora != single-device")


def test_pp_blip2_lora_step_matches_single_device():
    """The flagship recipe end-to-end: frozen EVA-ViT + Q-Former +
    projection feeding a GPipe-pipelined OPT with stage-stacked LoRA —
    loss and adapter grads must match blip2.lm_loss (the single-device
    objective the reference trains, blip_2_training.py:280-293)."""
    from garbage_classification_rca_tpu.models.vlm import (blip2,
                                                           blip2_vision)
    from garbage_classification_rca_tpu.models.vlm import qformer as qf

    cfg = blip2.Blip2Config(
        vision=blip2_vision.VisionConfig(layers=1, hidden=32, heads=2,
                                         ffn=64, patch=14, image_size=28),
        qformer=qf.QFormerConfig(layers=1, hidden=32, heads=2, ffn=64,
                                 n_query=4, cross_frequency=1,
                                 vision_hidden=32),
        opt=opt.OPTConfig(layers=4, hidden=64, heads=4, ffn=128,
                          vocab=300, max_pos=64),
        lora_r=2, lora_alpha=8)
    params = blip2.init(jax.random.PRNGKey(0), cfg)
    lora = blip2.init_lora(jax.random.PRNGKey(1), cfg)
    # give B a nonzero value so lora actually contributes to the loss
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.01 if x.ndim == 2 and x.shape[0] == cfg.lora_r
        else x, lora)

    rng = np.random.default_rng(5)
    b, l = 4, 6
    batch = {
        "pixel_values": jnp.asarray(
            rng.normal(size=(b, 28, 28, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(
            rng.integers(0, cfg.opt.vocab, (b, l)).astype(np.int32)),
        "attention_mask": jnp.asarray(np.ones((b, l), np.int32)),
        "labels": jnp.asarray(
            rng.integers(0, cfg.opt.vocab, (b, l)).astype(np.int32)),
    }

    want_loss, want_g = jax.value_and_grad(
        lambda lo: blip2.lm_loss(params, batch["pixel_values"],
                                 batch["input_ids"],
                                 batch["attention_mask"],
                                 batch["labels"], cfg, lora=lo))(lora)

    mesh = make_mesh("data:2,pipe:4")
    stacked = pp.shard_pipeline_params(
        mesh, pp.stack_pipeline_params(params["opt"]["layers"], 4))
    slora = pp.shard_pipeline_params(
        mesh, pp.stack_pipeline_lora(lora, cfg.opt.layers, 4))
    tx = optax.adamw(5e-4)
    step = pp.make_pp_blip2_train_step(tx, cfg, mesh, n_microbatches=2)
    new_lora, _, loss = step(slora, tx.init(slora), params, stacked, batch)

    np.testing.assert_allclose(float(loss), float(want_loss), rtol=2e-5)
    g1 = {"lora": pp.stack_pipeline_lora(want_g, cfg.opt.layers, 4)}
    tr1 = {"lora": pp.stack_pipeline_lora(lora, cfg.opt.layers, 4)}
    upd, _ = tx.update(g1, tx.init(tr1), tr1)
    want = optax.apply_updates(tr1, upd)["lora"]
    _assert_trees_close(new_lora, want, rtol=1e-3, atol=5e-5,
                        msg="pp blip2 lora step != single-device")


def test_stack_pipeline_lora_rejects_sparse_and_nonuniform():
    cfg, _ = _tiny_opt()
    lora = _tiny_lora(cfg)
    del lora["2"]
    with pytest.raises(ValueError, match="every layer"):
        pp.stack_pipeline_lora(lora, cfg.layers, 4)
    lora = _tiny_lora(cfg)
    del lora["2"]["k"]                       # present but non-uniform
    with pytest.raises(ValueError, match="uniform"):
        pp.stack_pipeline_lora(lora, cfg.layers, 4)
