"""BLIP-2 parity vs HF transformers (tiny random-init Blip2 config):
vision tower, Q-Former features, full LM logits, loss, and LoRA."""

import numpy as np
import pytest
import torch

from garbage_classification_rca_tpu.checkpoint.torch_convert import numpy_state_dict


def _tiny_cfgs():
    from transformers import (Blip2Config, Blip2QFormerConfig,
                              Blip2VisionConfig, OPTConfig)
    from garbage_classification_rca_tpu.models.vlm import (blip2,
                                                           blip2_vision,
                                                           opt as jopt,
                                                           qformer as jqf)

    hf = Blip2Config(
        vision_config=Blip2VisionConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=3,
            num_attention_heads=4, image_size=56, patch_size=14).to_dict(),
        qformer_config=Blip2QFormerConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, encoder_hidden_size=64,
            cross_attention_frequency=2).to_dict(),
        text_config=OPTConfig(
            hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
            ffn_dim=96, vocab_size=200, max_position_embeddings=64,
            word_embed_proj_dim=48).to_dict(),
        num_query_tokens=8)
    ours = blip2.Blip2Config(
        vision=blip2_vision.VisionConfig(layers=3, hidden=64, heads=4,
                                         ffn=128, patch=14, image_size=56),
        qformer=jqf.QFormerConfig(layers=2, hidden=32, heads=4, ffn=64,
                                  n_query=8, cross_frequency=2,
                                  vision_hidden=64),
        opt=jopt.OPTConfig(layers=2, hidden=48, heads=4, ffn=96, vocab=200,
                           max_pos=64),
        lora_r=4, lora_alpha=8)
    return hf, ours


@pytest.fixture(scope="module")
def models():
    from transformers import Blip2ForConditionalGeneration
    hf_cfg, our_cfg = _tiny_cfgs()
    torch.manual_seed(0)
    tm = Blip2ForConditionalGeneration(hf_cfg).eval()
    return tm, our_cfg


@pytest.fixture(scope="module")
def converted(models):
    from garbage_classification_rca_tpu.checkpoint.torch_convert import (
        TrackingDict)
    from garbage_classification_rca_tpu.models.vlm import blip2
    tm, cfg = models
    td = TrackingDict(numpy_state_dict(tm))
    params, lora = blip2.convert_torch(td, cfg)
    td.audit()          # every HF checkpoint tensor consumed (VERDICT r2 #4)
    assert lora is None
    return params


def _inputs(b=2, l=7):
    rng = np.random.default_rng(0)
    pix = rng.normal(size=(b, 3, 56, 56)).astype(np.float32)
    ids = rng.integers(4, 200, (b, l)).astype(np.int32)
    mask = np.ones((b, l), np.int32)
    mask[0, -2:] = 0
    ids[0, -2:] = 1   # pad token
    return pix, ids, mask


def test_vision_parity(models, converted):
    import jax.numpy as jnp
    from garbage_classification_rca_tpu.models.vlm import blip2_vision
    tm, cfg = models
    pix, _, _ = _inputs()
    with torch.no_grad():
        want = tm.vision_model(torch.tensor(pix)).last_hidden_state.numpy()
    got = blip2_vision.encode(converted["vision"],
                              jnp.asarray(pix.transpose(0, 2, 3, 1)),
                              cfg.vision)
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)


def test_qformer_features_parity(models, converted):
    import jax.numpy as jnp
    from garbage_classification_rca_tpu.models.vlm import blip2
    tm, cfg = models
    pix, _, _ = _inputs()
    with torch.no_grad():
        img = tm.vision_model(torch.tensor(pix)).last_hidden_state
        want = tm.qformer(
            query_embeds=tm.query_tokens.expand(img.shape[0], -1, -1),
            encoder_hidden_states=img).last_hidden_state.numpy()
    got = blip2.query_features(converted,
                               jnp.asarray(pix.transpose(0, 2, 3, 1)), cfg)
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)


def _hf_with_placeholders(tm, pix, ids, mask, n_query, image_token=3):
    """transformers>=4.5x scatters query embeds into image-placeholder
    positions of input_ids (the 4.3x era the reference used prepends them);
    leading placeholders make the two equivalent."""
    tm.config.image_token_id = image_token
    b = ids.shape[0]
    ph = np.full((b, n_query), image_token, ids.dtype)
    ids_hf = np.concatenate([ph, ids], axis=1)
    mask_hf = np.concatenate([np.ones_like(ph), mask], axis=1)
    with torch.no_grad():
        out = tm(pixel_values=torch.tensor(pix),
                 input_ids=torch.tensor(ids_hf, dtype=torch.long),
                 attention_mask=torch.tensor(mask_hf, dtype=torch.long))
    return out


def test_full_lm_logits_and_loss_parity(models, converted):
    import jax.numpy as jnp
    from garbage_classification_rca_tpu.models.vlm import blip2
    tm, cfg = models
    pix, ids, mask = _inputs()
    n_query = cfg.qformer.n_query
    out = _hf_with_placeholders(tm, pix, ids, mask, n_query)
    got = blip2.forward_lm(converted, jnp.asarray(pix.transpose(0, 2, 3, 1)),
                           jnp.asarray(ids), jnp.asarray(mask), cfg)
    np.testing.assert_allclose(np.asarray(got), out.logits.numpy(),
                               rtol=5e-4, atol=5e-4)

    # loss: reference-era semantics (logits sliced to the text segment,
    # shift-CE over non-(-100) labels) — oracle computed in numpy from the
    # HF logits
    labels = np.where(mask == 1, ids, -100)
    hf_text_logits = out.logits.numpy()[:, n_query:]
    shift_logits = hf_text_logits[:, :-1]
    shift_labels = labels[:, 1:]
    lsm = shift_logits - shift_logits.max(-1, keepdims=True)
    lsm = lsm - np.log(np.exp(lsm).sum(-1, keepdims=True))
    valid = shift_labels != -100
    picked = np.take_along_axis(
        lsm, np.clip(shift_labels, 0, None)[..., None], axis=-1)[..., 0]
    want_loss = -(picked * valid).sum() / valid.sum()
    loss = blip2.lm_loss(converted, jnp.asarray(pix.transpose(0, 2, 3, 1)),
                         jnp.asarray(ids), jnp.asarray(mask),
                         jnp.asarray(labels), cfg)
    np.testing.assert_allclose(float(loss), want_loss, rtol=2e-4)


def test_next_token_logits_match_generate_argmax(models, converted):
    import jax.numpy as jnp
    from garbage_classification_rca_tpu.models.vlm import blip2
    tm, cfg = models
    pix, ids, mask = _inputs()
    # compare on the unpadded row (row 1); right-padded rows are handled by
    # our last-non-pad indexing
    out = _hf_with_placeholders(tm, pix, ids, mask, cfg.qformer.n_query)
    want_next = out.logits[1, -1].numpy()
    got = blip2.next_token_logits(
        converted, jnp.asarray(pix.transpose(0, 2, 3, 1)),
        jnp.asarray(ids), jnp.asarray(mask), cfg)
    np.testing.assert_allclose(np.asarray(got)[1], want_next,
                               rtol=5e-4, atol=5e-4)


def test_generate_matches_hf_greedy(models, converted):
    """KV-cached multi-token greedy decode == HF generate (num_beams=1,
    do_sample=False). Unpadded prompts (HF right-pad generation semantics
    differ; our 1-token path's padded-row handling is covered above)."""
    import jax.numpy as jnp
    from garbage_classification_rca_tpu.models.vlm import blip2
    tm, cfg = models
    tm.config.image_token_id = 3
    rng = np.random.default_rng(4)
    b, lp = 2, 6
    pix = rng.normal(size=(b, 3, 56, 56)).astype(np.float32)
    ids = rng.integers(4, 200, (b, lp)).astype(np.int32)
    mask = np.ones((b, lp), np.int32)
    n_query = cfg.qformer.n_query
    ph = np.full((b, n_query), 3, ids.dtype)
    ids_hf = np.concatenate([ph, ids], axis=1)
    mask_hf = np.ones_like(ids_hf)
    n_new = 5
    with torch.no_grad():
        out = tm.generate(pixel_values=torch.tensor(pix),
                          input_ids=torch.tensor(ids_hf, dtype=torch.long),
                          attention_mask=torch.tensor(mask_hf,
                                                      dtype=torch.long),
                          max_new_tokens=n_new, do_sample=False,
                          num_beams=1, min_new_tokens=n_new)
    want = out[:, -n_new:].numpy()
    toks, valid = blip2.generate(
        converted, jnp.asarray(pix.transpose(0, 2, 3, 1)),
        jnp.asarray(ids), jnp.asarray(mask), cfg,
        max_new_tokens=n_new, eos_id=-1)   # eos off: match min_new_tokens
    assert np.asarray(valid).all()
    np.testing.assert_array_equal(np.asarray(toks), want)


def test_generate_padded_rows_and_eos(models, converted):
    """Right-padded prompts: each row's first generated token must equal
    its own 1-token constrained decode (next_token_logits argmax); EOS
    masks the tail of `valid`."""
    import jax.numpy as jnp
    from garbage_classification_rca_tpu.models.vlm import blip2
    tm, cfg = models
    pix, ids, mask = _inputs()                # row 0 right-padded
    next_logits = blip2.next_token_logits(
        converted, jnp.asarray(pix.transpose(0, 2, 3, 1)),
        jnp.asarray(ids), jnp.asarray(mask), cfg)
    want_first = np.argmax(np.asarray(next_logits, np.float32), -1)
    toks, valid = blip2.generate(
        converted, jnp.asarray(pix.transpose(0, 2, 3, 1)),
        jnp.asarray(ids), jnp.asarray(mask), cfg, max_new_tokens=3,
        eos_id=int(want_first[0]))   # row 0's first token acts as EOS
    toks, valid = np.asarray(toks), np.asarray(valid)
    np.testing.assert_array_equal(toks[:, 0], want_first)
    assert valid[0, 0] and not valid[0, 1:].any()   # EOS then masked
    assert valid[1].all() or (toks[1] == int(want_first[0])).any()


def test_lora_roundtrip_with_peft(models, converted):
    """peft-wrapped checkpoint: adapters extracted + forward parity."""
    import jax.numpy as jnp
    from peft import LoraConfig, get_peft_model
    from garbage_classification_rca_tpu.models.vlm import blip2

    tm, cfg = models
    lcfg = LoraConfig(r=4, lora_alpha=8, lora_dropout=0.0,
                      target_modules=["q_proj", "k_proj"])
    torch.manual_seed(1)
    pm = get_peft_model(tm, lcfg)
    # make B nonzero so the adapters actually change the output
    for n, p in pm.named_parameters():
        if "lora_B" in n:
            p.data.normal_(0, 0.05)
    pm = pm.eval()

    from garbage_classification_rca_tpu.checkpoint.torch_convert import (
        TrackingDict)
    sd = TrackingDict(numpy_state_dict(pm))
    params, lora = blip2.convert_torch(sd, cfg)
    sd.audit()     # peft rewrites (base_model prefix, base_layer, lora_A/B)
    assert lora is not None and "0" in lora and "q" in lora["0"]

    pix, ids, mask = _inputs()
    want = _hf_with_placeholders(pm, pix, ids, mask,
                                 cfg.qformer.n_query).logits.numpy()
    got = blip2.forward_lm(params, jnp.asarray(pix.transpose(0, 2, 3, 1)),
                           jnp.asarray(ids), jnp.asarray(mask), cfg,
                           lora=lora)
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)
    # without adapters the logits must differ
    got0 = blip2.forward_lm(params, jnp.asarray(pix.transpose(0, 2, 3, 1)),
                            jnp.asarray(ids), jnp.asarray(mask), cfg)
    assert not np.allclose(np.asarray(got0), want, atol=1e-5)


def test_lora_train_step_params_as_args():
    """make_lora_train_step must thread the frozen params as a jit ARGUMENT
    (closing over the full-size model would bake ~7.5 GB of constants into
    the executable); step.raw is the arg-passing form for callers nesting
    the step in a larger jit. Both must produce identical updates."""
    import jax
    import numpy as np

    from garbage_classification_rca_tpu.cli.blip2_common import (
        tiny_blip2_config)
    from garbage_classification_rca_tpu.cli.blip2_train import (
        make_lora_train_step)
    from garbage_classification_rca_tpu.models.vlm import blip2

    cfg = tiny_blip2_config()
    params = blip2.init(jax.random.PRNGKey(0), cfg)
    lora = blip2.init_lora(jax.random.PRNGKey(1), cfg)
    opt, step = make_lora_train_step(cfg, params, acc_steps=2)
    opt_state = opt.init(lora)

    rng = np.random.default_rng(0)
    sz = cfg.vision.image_size
    batch = {
        "image": rng.integers(0, 255, (2, 2, sz, sz, 3)).astype(np.uint8),
        "input_ids": rng.integers(4, 100, (2, 2, 6)).astype(np.int32),
        "attention_mask": np.ones((2, 2, 6), np.int32),
        "label_tokens": rng.integers(4, 100, (2, 2, 4)).astype(np.int32),
    }
    l1, o1, loss1 = step(lora, opt_state, batch, jax.random.PRNGKey(2))
    l2, o2, loss2 = step.raw(params, lora, opt_state, batch)
    assert np.isfinite(float(loss1))
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(l1),
                    jax.tree_util.tree_leaves(l2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_blip2_eval_steps_sharded_match_single(models, converted):
    """cli.blip2_test / qformer_test dp eval: the mesh-sharded step must
    reproduce the unsharded step's predictions exactly (params replicated,
    batch over axis 'data')."""
    import jax
    import numpy as np

    from garbage_classification_rca_tpu.cli.blip2_train import make_eval_step
    from garbage_classification_rca_tpu.cli.qformer_train import make_steps
    from garbage_classification_rca_tpu.parallel.mesh import (
        make_mesh, shard_params)
    from garbage_classification_rca_tpu.models.vlm import blip2 as blip2_mod

    tm, cfg = models
    del tm
    rng = np.random.default_rng(5)
    b, l = 8, 9
    batch = {
        "image": rng.integers(0, 255, (b, 56, 56, 3)).astype(np.uint8),
        "input_ids": rng.integers(4, 200, (b, l)).astype(np.int32),
        "attention_mask": np.ones((b, l), np.int32),
        "label_tokens": rng.integers(4, 200, (b, 2)).astype(np.int32),
        "label": rng.integers(0, 4, (b,)).astype(np.int32),
        "valid": np.asarray([1] * 7 + [0], np.int32),
    }
    aft = np.asarray([5, 6, 7, 8], np.int32)
    lora = blip2_mod.init_lora(jax.random.PRNGKey(0), cfg)

    single = make_eval_step(cfg, converted, aft)
    p_want, c_want = single(lora, batch)

    mesh = make_mesh("data:8")
    sharded_params = shard_params(mesh, converted)
    sharded = make_eval_step(cfg, sharded_params, aft, mesh=mesh)
    p_got, c_got = sharded(shard_params(mesh, lora), batch)
    np.testing.assert_array_equal(np.asarray(p_got), np.asarray(p_want))
    assert int(c_got) == int(c_want)

    clf = {"classifier": {"w": np.zeros((cfg.qformer.hidden, 4), np.float32)
                          + rng.normal(size=(cfg.qformer.hidden, 4)),
                          "b": np.zeros((4,), np.float32)}}
    import jax.numpy as jnp
    clf = jax.tree_util.tree_map(jnp.asarray, clf)
    _, _, qsingle = make_steps(cfg, converted)
    _, _, qsharded = make_steps(cfg, sharded_params, mesh=mesh)
    qp_want, qc_want = qsingle(clf, batch)
    qp_got, qc_got = qsharded(shard_params(mesh, clf), batch)
    np.testing.assert_array_equal(np.asarray(qp_got), np.asarray(qp_want))
    assert int(qc_got) == int(qc_want)


def test_left_padded_prompts_match_unpadded(models, converted):
    """The PRODUCTION batcher LEFT-pads prompts to 100 (blip2_common.
    left_pad, mirroring the reference's padding_side='left',
    blip_2_training.py:66). next_token_logits and generate must give the
    same answer for a left-padded prompt as for the unpadded one —
    the round-3 code-review caught the gather at n_valid-1 pointing into
    the pad region."""
    import jax.numpy as jnp
    from garbage_classification_rca_tpu.models.vlm import blip2

    tm, cfg = models
    del tm
    rng = np.random.default_rng(6)
    b, lp, total = 2, 6, 12
    pix = rng.normal(size=(b, 3, 56, 56)).astype(np.float32)
    ids = rng.integers(4, 200, (b, lp)).astype(np.int32)
    mask = np.ones((b, lp), np.int32)
    pad = total - lp
    ids_l = np.concatenate([np.ones((b, pad), np.int32), ids], axis=1)
    mask_l = np.concatenate([np.zeros((b, pad), np.int32), mask], axis=1)

    px = jnp.asarray(pix.transpose(0, 2, 3, 1))
    want = np.asarray(blip2.next_token_logits(
        converted, px, jnp.asarray(ids), jnp.asarray(mask), cfg))
    got = np.asarray(blip2.next_token_logits(
        converted, px, jnp.asarray(ids_l), jnp.asarray(mask_l), cfg))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    toks_w, _ = blip2.generate(converted, px, jnp.asarray(ids),
                               jnp.asarray(mask), cfg, max_new_tokens=4,
                               eos_id=-1)
    toks_g, _ = blip2.generate(converted, px, jnp.asarray(ids_l),
                               jnp.asarray(mask_l), cfg, max_new_tokens=4,
                               eos_id=-1)
    np.testing.assert_array_equal(np.asarray(toks_g), np.asarray(toks_w))
