"""BLIP-2 LoRA / Q-Former classifier TRAINING trajectory parity vs torch.

Backs the update-rule choices in cli/blip2_train.py and cli/qformer_train.py:
  * AdamW must be optax.adamw(5e-4, eps=1e-5, weight_decay=0.01) to match
    torch.optim.AdamW(lr=5e-4, eps=1e-05) with torch's default weight decay
    (reference blip_2_training.py:228, q_former_training.py:243) — optax's
    defaults (eps=1e-8, wd=1e-4) silently diverge;
  * accumulated grads divide by the STATIC acc_steps even on a trailing
    PARTIAL window, because the reference backwards loss/accumulation_steps
    per microbatch (blip_2_training.py:274-292) and its leftover step keeps
    that scale;
  * batch-padding rows (valid=0) must drop out of the LM cross-entropy.

Test structure (the model forward runs in bf16 — nn.linear casts weights
to the input dtype — so end-to-end torch parity is bounded by bf16
rounding, not fp32):
  * the AdamW hyperparameters are pinned EXACTLY by an optax-vs-torch
    update-rule test on synthetic fp32 grads (rtol 1e-6, 5 steps);
  * the static-acc_steps divisor is pinned EXACTLY by a pure-jax test: a
    partial window must equal the same window padded with a valid=0
    microbatch (whose loss and grads are identically zero);
  * two end-to-end trajectories (two full windows + one trailing partial)
    run against torch replicas (HF tiny Blip2 + peft for LoRA) at honest
    bf16-forward tolerances — they catch semantic bugs (wrong divisor,
    wrong masking: >10% deviations), not rounding.
"""

import numpy as np
import pytest
import torch

from garbage_classification_rca_tpu.checkpoint.torch_convert import (
    TrackingDict, numpy_state_dict)
from tests.test_blip2 import _tiny_cfgs

ACC, BS, PROMPT_L, LABEL_L = 2, 2, 6, 4
# windows: two full (ACC microbatches) + one trailing partial (1 microbatch)
WINDOW_SIZES = (ACC, ACC, 1)


def _bf16_clip_images(rng, n):
    """uint8 images -> the EXACT array the jitted step feeds the model:
    normalize_clip quantizes to bf16 (blip2_common.py:28-32); round-trip
    through bf16 here so the torch replica sees bit-identical pixels."""
    import jax.numpy as jnp
    from garbage_classification_rca_tpu.cli.blip2_common import normalize_clip
    u8 = rng.integers(0, 255, (n, BS, 56, 56, 3)).astype(np.uint8)
    x = np.asarray(normalize_clip(jnp.asarray(u8)).astype(jnp.float32))
    return u8, x


def _lm_batches(rng, n):
    """microbatches with left-padded prompts, padded label tokens, and one
    valid=0 batch-padding row in the last microbatch."""
    ids = rng.integers(4, 200, (n, BS, PROMPT_L)).astype(np.int32)
    mask = np.ones((n, BS, PROMPT_L), np.int32)
    mask[:, 0, :2] = 0
    ids[:, 0, :2] = 1          # left pad (reference padding_side='left')
    lab = rng.integers(4, 200, (n, BS, LABEL_L)).astype(np.int32)
    lab[:, 1, -2:] = 1         # trailing label pads
    valid = np.ones((n, BS), np.int32)
    valid[-1, -1] = 0          # tail batch-padding row
    return ids, mask, lab, valid


def _torch_lm_loss(pm, x, ids, mask, lab, valid, n_query):
    """replica of blip2.lm_loss as driven by make_lora_train_step's
    loss_fn (cli/blip2_train.py:51-69): concat prompt+label, label pads AND
    valid=0 rows -> -100, shift-CE mean over valid positions."""
    ids_full = np.concatenate([ids, lab], 1)
    mask_full = np.concatenate([mask, (lab != 1).astype(mask.dtype)], 1)
    labels = np.where((lab == 1) | (valid[:, None] == 0), -100, lab)
    full_labels = np.concatenate(
        [np.full_like(ids, -100), labels], 1)
    # grad-enabled twin of test_blip2._hf_with_placeholders: query embeds
    # scatter into leading image-placeholder token positions
    image_token = 3
    pm.config.image_token_id = image_token
    b = ids_full.shape[0]
    ph = np.full((b, n_query), image_token, ids_full.dtype)
    out = pm(pixel_values=torch.tensor(x.transpose(0, 3, 1, 2)),
             input_ids=torch.tensor(
                 np.concatenate([ph, ids_full], 1), dtype=torch.long),
             attention_mask=torch.tensor(
                 np.concatenate([np.ones_like(ph), mask_full], 1),
                 dtype=torch.long))
    text_logits = out.logits[:, n_query:]
    shift_logits = text_logits[:, :-1].reshape(-1, text_logits.shape[-1])
    shift_labels = torch.tensor(full_labels[:, 1:].reshape(-1),
                                dtype=torch.long)
    return torch.nn.functional.cross_entropy(
        shift_logits.float(), shift_labels, ignore_index=-100)


def test_adamw_hyperparams_match_torch():
    """optax.adamw(5e-4, eps=1e-5, weight_decay=0.01) must track
    torch.optim.AdamW(lr=5e-4, eps=1e-05) (torch default wd=0.01) exactly
    on fp32 synthetic grads — optax's own defaults (eps=1e-8, wd=1e-4)
    fail this at rtol far beyond 1e-6 within 5 steps."""
    import jax
    import optax

    rng = np.random.default_rng(0)
    p0 = rng.normal(0, 0.5, (7, 5)).astype(np.float32)
    grads = rng.normal(0, 0.05, (5, 7, 5)).astype(np.float32)

    opt = optax.adamw(5e-4, eps=1e-5, weight_decay=0.01)
    params = {"w": p0.copy()}
    state = opt.init(params)

    tp = torch.nn.Parameter(torch.tensor(p0))
    topt = torch.optim.AdamW([tp], lr=5e-4, eps=1e-5)

    for g in grads:
        updates, state = opt.update({"w": g}, state, params)
        params = optax.apply_updates(params, updates)
        topt.zero_grad()
        tp.grad = torch.tensor(g)
        topt.step()
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   tp.detach().numpy(), rtol=1e-6, atol=1e-8)
    del jax


def test_partial_window_divides_by_static_acc_steps():
    """cli/qformer_train.make_steps: a trailing PARTIAL accumulation window
    must divide by the configured acc_steps, not the window length
    (reference q_former_training.py:294-301 backwards loss/8 regardless).
    Exact check: a 1-microbatch window padded with a fully valid=0
    microbatch (zero loss, zero grads by cross_entropy_loss's masked
    denominator) must yield IDENTICAL params — any dynamic divisor would
    scale the update by 2x."""
    import jax
    from garbage_classification_rca_tpu.cli.qformer_train import make_steps
    from garbage_classification_rca_tpu.cli.blip2_common import (
        tiny_blip2_config)
    from garbage_classification_rca_tpu.models.vlm import blip2

    cfg = tiny_blip2_config()
    params = blip2.init(jax.random.PRNGKey(0), cfg)
    trainable = {"classifier": blip2.init_classifier(
        jax.random.PRNGKey(1), cfg)}
    opt, train_step, _ = make_steps(cfg, params, acc_steps=2)
    opt_state = opt.init(trainable)

    rng = np.random.default_rng(2)
    sz = cfg.vision.image_size
    img = rng.integers(0, 255, (1, BS, sz, sz, 3)).astype(np.uint8)
    lab = rng.integers(0, 4, (1, BS)).astype(np.int32)
    ones = np.ones((1, BS), np.int32)

    t1, o1, loss1 = train_step(
        trainable, opt_state,
        {"image": img, "label": lab, "valid": ones})
    t2, o2, loss2 = train_step(
        trainable, opt_state,
        {"image": np.concatenate([img, img]),
         "label": np.concatenate([lab, lab]),
         "valid": np.concatenate([ones, np.zeros_like(ones)])})
    for a, b in zip(jax.tree_util.tree_leaves(t1),
                    jax.tree_util.tree_leaves(t2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg="partial-window update")
    # reported losses divide by the ACTUAL window length (display only)
    np.testing.assert_allclose(float(loss1), 2 * float(loss2), rtol=1e-5)


@pytest.fixture(scope="module")
def lora_setup():
    from peft import LoraConfig, get_peft_model
    from transformers import Blip2ForConditionalGeneration
    from garbage_classification_rca_tpu.models.vlm import blip2

    hf_cfg, cfg = _tiny_cfgs()
    torch.manual_seed(0)
    tm = Blip2ForConditionalGeneration(hf_cfg).eval()
    lcfg = LoraConfig(r=4, lora_alpha=8, lora_dropout=0.0,
                      target_modules=["q_proj", "k_proj"])
    torch.manual_seed(1)
    pm = get_peft_model(tm, lcfg)
    # nonzero B so weight decay acts on non-trivial values from step 1
    for n, p in pm.named_parameters():
        if "lora_B" in n:
            p.data.normal_(0, 0.05)
    pm = pm.eval()             # dropout off; the jax path has none either
    sd = TrackingDict(numpy_state_dict(pm))
    params, lora = blip2.convert_torch(sd, cfg)
    sd.audit()
    return pm, cfg, params, lora


def test_lora_trajectory_matches_torch(lora_setup):
    import jax
    from garbage_classification_rca_tpu.cli.blip2_train import (
        make_lora_train_step)
    from garbage_classification_rca_tpu.models.vlm import blip2

    pm, cfg, params, lora = lora_setup
    opt, step = make_lora_train_step(cfg, params, acc_steps=ACC)
    opt_state = opt.init(jax.device_get(lora))

    n = sum(WINDOW_SIZES)
    rng = np.random.default_rng(3)
    u8, x_exact = _bf16_clip_images(rng, n)
    ids, mask, lab, valid = _lm_batches(rng, n)

    # torch.optim.AdamW(lr=5e-4, eps=1e-05), wd at torch's 0.01 default
    topt = torch.optim.AdamW(
        [p for p in pm.parameters() if p.requires_grad], lr=5e-4, eps=1e-5)

    losses_j, losses_t = [], []
    i = 0
    for w in WINDOW_SIZES:
        sl = slice(i, i + w)
        batch = {"image": u8[sl], "input_ids": ids[sl],
                 "attention_mask": mask[sl], "label_tokens": lab[sl],
                 "valid": valid[sl]}
        lora, opt_state, loss = step(lora, opt_state, batch,
                                     jax.random.PRNGKey(i))
        losses_j.append(float(loss))

        topt.zero_grad(set_to_none=True)
        mls = []
        for a in range(i, i + w):
            tl = _torch_lm_loss(pm, x_exact[a], ids[a], mask[a], lab[a],
                                valid[a], cfg.qformer.n_query)
            # reference: loss/accumulation_steps per microbatch — STATIC
            # divisor, also on the trailing partial window
            (tl / ACC).backward()
            mls.append(float(tl.detach()))
        topt.step()
        losses_t.append(float(np.mean(mls)))
        i += w

    # bf16 forward on the jax side; semantic bugs (wrong divisor/masking)
    # deviate >10%, far beyond this
    np.testing.assert_allclose(losses_j, losses_t, rtol=2e-3,
                               err_msg="per-window loss trajectories")

    # final adapters, compared in jax layout via the converter
    sd = TrackingDict(numpy_state_dict(pm))
    _, want_lora = blip2.convert_torch(sd, cfg)
    sd.audit()
    got = jax.tree_util.tree_leaves(jax.device_get(lora))
    want = jax.tree_util.tree_leaves(want_lora)
    assert len(got) == len(want) and len(got) > 0
    # atol covers AdamW's normalizing update over bf16-forward grads:
    # near-zero grads make mhat/(sqrt(vhat)+eps) amplify rounding noise up
    # to O(lr)=5e-4 per step x 3 steps; exact hyperparam/divisor parity is
    # pinned by the two tests above
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(w, np.float32),
                                   rtol=5e-3, atol=1.6e-3,
                                   err_msg="final LoRA adapters")
    # the run must have actually moved the adapters
    assert any(not np.allclose(np.asarray(g), np.asarray(w0))
               for g, w0 in zip(got,
                                jax.tree_util.tree_leaves(lora_setup[3])))


def test_qformer_classifier_trajectory_matches_torch(lora_setup):
    import jax
    from garbage_classification_rca_tpu.cli.qformer_train import make_steps
    from garbage_classification_rca_tpu.models.vlm import blip2

    pm, cfg, params, _ = lora_setup
    tm = pm.get_base_model()

    trainable = {"classifier": blip2.init_classifier(
        jax.random.PRNGKey(5), cfg)}
    opt, train_step, eval_step = make_steps(cfg, params, acc_steps=ACC)
    opt_state = opt.init(trainable)

    # torch classifier initialized FROM the jax head (jax linear stores
    # [in, out]; torch nn.Linear stores [out, in])
    head = torch.nn.Linear(cfg.qformer.hidden, 4)
    with torch.no_grad():
        head.weight.copy_(torch.tensor(
            np.asarray(trainable["classifier"]["w"], np.float32).T))
        head.bias.copy_(torch.tensor(
            np.asarray(trainable["classifier"]["b"], np.float32)))
    topt = torch.optim.AdamW(head.parameters(), lr=5e-4, eps=1e-5)

    n = sum(WINDOW_SIZES)
    rng = np.random.default_rng(9)
    u8, x_exact = _bf16_clip_images(rng, n)
    label = rng.integers(0, 4, (n, BS)).astype(np.int32)
    valid = np.ones((n, BS), np.int32)
    valid[-1, -1] = 0

    def torch_feat(a):
        with torch.no_grad():
            img = tm.vision_model(
                torch.tensor(x_exact[a].transpose(0, 3, 1, 2))
            ).last_hidden_state
            q = tm.qformer(
                query_embeds=tm.query_tokens.expand(img.shape[0], -1, -1),
                encoder_hidden_states=img).last_hidden_state
        return q[:, 0, :].float()

    losses_j, losses_t = [], []
    i = 0
    for w in WINDOW_SIZES:
        sl = slice(i, i + w)
        batch = {"image": u8[sl], "label": label[sl], "valid": valid[sl]}
        trainable, opt_state, loss = train_step(trainable, opt_state, batch)
        losses_j.append(float(loss))

        topt.zero_grad(set_to_none=True)
        mls = []
        for a in range(i, i + w):
            keep = valid[a] == 1
            logits = head(torch_feat(a)[keep])
            tl = torch.nn.functional.cross_entropy(
                logits, torch.tensor(label[a][keep], dtype=torch.long))
            (tl / ACC).backward()
            mls.append(float(tl.detach()))
        topt.step()
        losses_t.append(float(np.mean(mls)))
        i += w

    # bf16 towers feed the (fp32) head on the jax side — rounding-level
    # differences only; semantic bugs deviate >10%
    np.testing.assert_allclose(losses_j, losses_t, rtol=8e-3,
                               err_msg="per-window loss trajectories")
    np.testing.assert_allclose(
        np.asarray(trainable["classifier"]["w"], np.float32),
        head.weight.detach().numpy().T, rtol=5e-3, atol=1.6e-3,
        err_msg="final classifier weight")
    np.testing.assert_allclose(
        np.asarray(trainable["classifier"]["b"], np.float32),
        head.bias.detach().numpy(), rtol=5e-3, atol=1.6e-3,
        err_msg="final classifier bias")
