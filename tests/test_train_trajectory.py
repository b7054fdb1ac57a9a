"""End-to-end two-phase TRAINING trajectory parity vs torch.

Per-piece parity is asserted elsewhere (loss in test_train, SGD step,
plateau scheduler, BN train mode in test_nn_core); report-identity tests
cover the eval path end-to-end. This composes the training side: a
head-only phase then a full fine-tune phase at lr/fraction with
ReduceLROnPlateau, every optimizer step a grad-accumulated stack of two
microbatches, on a depth-truncated ShuffleNetV2 — per-step losses, val
predictions, plateau LR cuts, and the final params AND BatchNorm running
stats must all track a torch replica across all 10 optimizer steps.
Errors compound step-over-step, so this is the strongest hermetic proxy
for the <0.1% accuracy-parity criterion on the training side
(VERDICT r2 "what's missing" #2).

Mirrors reference semantics of main_image.py:85-130 (run_one_epoch),
:529-545 (SGD(weight_decay)/plateau), :547-709 (two phases, unfreeze +
lr/fraction_lr) with the one documented divergence: gradients are
AVERAGED over the effective batch (the reference divides the loss by
acc_steps only after backward(), scaling nothing — train/loop.py
docstring), so the torch replica here implements the fixed math too.
"""

import numpy as np
import pytest
import torch

from garbage_classification_rca_tpu.checkpoint.torch_convert import (
    numpy_state_dict)
from tests.torch_refs.misc_backbones_ref import ShuffleNetV2Ref

REPEATS = (2, 2, 2)          # depth-truncated; full widths kept
# gentle LRs: hot ones make the dynamics chaotic and fp32 rounding
# differences compound exponentially instead of testing parity
LR, REG, SMOOTH = 0.02, 1e-4, 0.1
FRACTION = 20.0
CLASS_W = np.array([1.2, 0.8, 1.0, 1.0], np.float32)
ACC, BS = 2, 4
# scripted plateau metrics: phase-2 epoch 2 is worse -> patience=0 cuts
# the LR for epoch 3's steps on both sides
PHASE1_METRICS = [0.4, 0.5]
PHASE2_METRICS = [0.5, 0.4, 0.6]


def _truncated_oracle():
    torch.manual_seed(11)
    m = ShuffleNetV2Ref()
    for si in range(3):
        units = list(getattr(m, f"stage{si + 2}").children())
        setattr(m, f"stage{si + 2}", torch.nn.Sequential(*units[:REPEATS[si]]))
    # non-trivial running stats so eval-mode BN is exercised from step 1
    for mod in m.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.05)
            mod.running_var.uniform_(0.8, 1.2)
    return m


def _data():
    rng = np.random.default_rng(7)
    xtr = rng.normal(size=(4, ACC, BS, 64, 64, 3)).astype(np.float32)
    ytr = rng.integers(0, 4, (4, ACC, BS)).astype(np.int32)
    xva = rng.normal(size=(8, 64, 64, 3)).astype(np.float32)
    return xtr, ytr, xva


def _torch_epoch(m, opt, stacks, losses_out):
    """One epoch of grad-accumulated steps, reference run_one_epoch shape
    (main_image.py:85-130) with mean-over-effective-batch gradients."""
    ce = torch.nn.CrossEntropyLoss(weight=torch.tensor(CLASS_W),
                                   label_smoothing=SMOOTH)
    wt = torch.tensor(CLASS_W)
    m.train()
    for x, y in stacks:
        opt.zero_grad(set_to_none=True)
        w_total = 0.0
        num = 0.0
        for a in range(ACC):
            imgs = torch.tensor(x[a]).permute(0, 3, 1, 2)
            labels = torch.tensor(y[a], dtype=torch.long)
            w_sum = wt[labels].sum()
            loss = ce(m(imgs), labels)
            (loss * w_sum).backward()
            w_total += float(w_sum)
            num += float(loss.detach()) * float(w_sum)
        for p in m.parameters():
            if p.grad is not None:
                p.grad /= w_total
        opt.step()
        losses_out.append(num / w_total)


@pytest.mark.slow
def test_two_phase_training_trajectory_matches_torch():
    import jax
    import jax.numpy as jnp
    from garbage_classification_rca_tpu.models.image import shufflenet_v2 as sh
    from garbage_classification_rca_tpu.train.loop import (
        head_only_mask, make_train_step)
    from garbage_classification_rca_tpu.train.optim import (
        PlateauScheduler, get_learning_rate, make_optimizer,
        set_learning_rate)

    m = _truncated_oracle()
    xtr, ytr, xva = _data()
    saved = sh.REPEATS
    sh.REPEATS = REPEATS
    try:
        params, state = sh.convert_torch(numpy_state_dict(m))

        def eval_preds(params, state):
            logits, _ = sh.apply(params, state, jnp.asarray(xva))
            return np.asarray(jnp.argmax(logits, -1))

        def torch_preds():
            m.eval()
            with torch.no_grad():
                out = m(torch.tensor(xva).permute(0, 3, 1, 2))
            return out.argmax(-1).numpy()

        losses_j, losses_t = [], []
        lrs_j, lrs_t = [], []

        # ---- phase 1: frozen trunk, head only (reference epochs loop) ----
        opt = make_optimizer("sgd", lr=LR, reg=REG,
                             trainable_mask=head_only_mask(params, ("fc",)))
        opt_state = opt.init(params)
        step = make_train_step(sh.apply, opt,
                               class_weights=CLASS_W, label_smoothing=SMOOTH,
                               compute_dtype=jnp.float32,
                               batch_to_inputs=lambda mb: mb["image"])
        sched = PlateauScheduler(LR, factor=0.2, patience=0)

        for p in m.parameters():
            p.requires_grad_(False)
        for p in m.fc.parameters():
            p.requires_grad_(True)
        topt = torch.optim.SGD(m.fc.parameters(), lr=LR, weight_decay=REG)
        tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            topt, "max", factor=0.2, patience=0)

        for epoch, metric in enumerate(PHASE1_METRICS):
            stacks = [(xtr[2 * epoch + i], ytr[2 * epoch + i])
                      for i in range(2)]
            for x, y in stacks:
                params, state, opt_state, loss, _ = step(
                    params, state, opt_state,
                    {"image": jnp.asarray(x), "label": jnp.asarray(y)},
                    jax.random.PRNGKey(epoch))
                losses_j.append(float(loss))
            _torch_epoch(m, topt, stacks, losses_t)
            np.testing.assert_array_equal(eval_preds(params, state),
                                          torch_preds(),
                                          err_msg=f"val preds, epoch {epoch}")
            opt_state = set_learning_rate(opt_state, sched.step(metric))
            tsched.step(metric)
            lrs_j.append(get_learning_rate(opt_state))
            lrs_t.append(topt.param_groups[0]["lr"])

        # ---- phase 2: unfreeze all at lr/fraction (main_image.py:623-709)
        lr2 = LR / FRACTION
        opt2 = make_optimizer("sgd", lr=lr2, reg=REG)
        opt_state = opt2.init(params)
        step = make_train_step(sh.apply, opt2, class_weights=CLASS_W,
                               label_smoothing=SMOOTH,
                               compute_dtype=jnp.float32,
                               batch_to_inputs=lambda mb: mb["image"])
        sched = PlateauScheduler(lr2, factor=0.2, patience=0)

        for p in m.parameters():
            p.requires_grad_(True)
        topt = torch.optim.SGD(m.parameters(), lr=lr2, weight_decay=REG)
        tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            topt, "max", factor=0.2, patience=0)

        for epoch, metric in enumerate(PHASE2_METRICS):
            stacks = [(xtr[(epoch + i) % 4], ytr[(epoch + i) % 4])
                      for i in range(2)]
            for x, y in stacks:
                params, state, opt_state, loss, _ = step(
                    params, state, opt_state,
                    {"image": jnp.asarray(x), "label": jnp.asarray(y)},
                    jax.random.PRNGKey(100 + epoch))
                losses_j.append(float(loss))
            _torch_epoch(m, topt, stacks, losses_t)
            np.testing.assert_array_equal(
                eval_preds(params, state), torch_preds(),
                err_msg=f"val preds, FT epoch {epoch}")
            opt_state = set_learning_rate(opt_state, sched.step(metric))
            tsched.step(metric)
            lrs_j.append(get_learning_rate(opt_state))
            lrs_t.append(topt.param_groups[0]["lr"])

        # the scripted metrics must have cut the LR mid-phase-2 (epoch 2
        # trains at 0.2*lr2) — otherwise the schedule never influenced a
        # step and the assertion below proves less than intended
        assert lrs_j[-2] == pytest.approx(lr2 * 0.2)
        np.testing.assert_allclose(lrs_j, lrs_t, rtol=1e-7,
                                   err_msg="plateau LR trajectories")
        np.testing.assert_allclose(losses_j, losses_t, rtol=3e-4, atol=1e-5,
                                   err_msg="per-step loss trajectories")

        # final weights and BN running stats, compared in jax layout via
        # the (independently tested) converter
        want_p, want_s = sh.convert_torch(numpy_state_dict(m))
        for got, want, what in ((params, want_p, "params"),
                                (state, want_s, "BN running stats")):
            for g, w in zip(jax.tree_util.tree_leaves(got),
                            jax.tree_util.tree_leaves(want)):
                np.testing.assert_allclose(
                    np.asarray(g, np.float32), np.asarray(w, np.float32),
                    rtol=2e-3, atol=6e-5,
                    err_msg=f"final {what} after 10 optimizer steps")
    finally:
        sh.REPEATS = saved
