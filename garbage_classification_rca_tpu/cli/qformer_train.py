"""Q-Former classifier training CLI.

Parity with reference q_former_training.py:189-332: frozen BLIP-2
backbone, classifier head = Linear(768, 4) on
qformer_outputs.last_hidden_state[:, 0, :], CE on class ids, AdamW every
8 microbatches; saves classifier weights separately
(q_former_training.py:33-47, consumed via --classifier_weights). The
reference's peft LoRA wrap trains nothing there — see make_steps —
so a frozen backbone is exact parity.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import args_parser, jnp_compute_dtype
from ..models.vlm import blip2
from ..nn import core as nn
from ..train.engine import (MetricsLogger, PhaseResult, maybe_load_resume,
                            restore_opt_state, save_best, save_train_state)
from ..train.loss import cross_entropy_loss
from .blip2_common import (BATCH_KEYS, Blip2Batcher, build_blip2,
                           make_accum_step, normalize_clip,
                           place_blip2_params, vlm_eval,
                           vlm_multihost_mesh_check, vlm_train_stream)

TRAIN_SUFFIX = "_Train"
VAL_SUFFIX = "_Val"
QF_LR = 5e-4
QF_ACC = 8               # reference q_former_training.py:241


def make_steps(cfg, params, acc_steps: int = QF_ACC, mesh=None,
               compute_dtype=jnp.bfloat16,
               hf_internal_dropout: bool = False):
    """Classifier-only training is EXACT reference parity, not a cut: the
    reference peft-wraps the model (q_former_training.py:230-240) but its
    LoRA targets q_proj/k_proj, which only exist in the OPT decoder — the
    loss taps qformer_outputs (:290-294) and never touches OPT, so the
    adapters receive no gradient (torch skips grad-None params in step())
    and stay at init (lora_B=0 => identity) for the whole run. Only the
    Linear(768,4) head actually trains there too.

    The optimizer steps every 8 microbatches with loss/8 backwards
    (q_former_training.py:241,294-301): here the stacked window is one
    lax.scan; a trailing partial window still divides by the configured
    acc_steps, mirroring the reference's leftover step."""
    # reference: torch.optim.AdamW(lr=5e-4, eps=1e-05)
    # (q_former_training.py:243) — torch defaults weight_decay to 0.01,
    # optax to 1e-4 / eps 1e-8; spell both out for update-rule parity
    opt = optax.adamw(QF_LR, eps=1e-5, weight_decay=0.01)

    # frozen BLIP-2 params enter as a jit ARGUMENT: closing over them
    # would embed GBs of weights in the executable as captured constants
    if hf_internal_dropout:
        # reference q_former_training keeps the (peft-wrapped) model in
        # train() mode, so the Q-Former's HF-internal p=0.1 dropout is
        # active while its features feed the classifier loss (the OPT
        # tower never runs on this path)
        def loss_fn(trainable, frozen, batch, rng):
            x = normalize_clip(batch["image"], compute_dtype)
            feat = blip2.qformer_cls_feature(
                frozen, x, cfg,
                drop=nn.HFDropout(rng)).astype(jnp.float32)
            logits = nn.linear(trainable["classifier"], feat)
            return cross_entropy_loss(logits, batch["label"],
                                      valid=batch["valid"])
    else:
        def loss_fn(trainable, frozen, batch):
            x = normalize_clip(batch["image"], compute_dtype)
            feat = blip2.qformer_cls_feature(frozen, x,
                                             cfg).astype(jnp.float32)
            logits = nn.linear(trainable["classifier"], feat)
            return cross_entropy_loss(logits, batch["label"],
                                      valid=batch["valid"])

    # accumulation machinery shared with blip2_train (blip2_common)
    _train_step = make_accum_step(jax.value_and_grad(loss_fn), opt,
                                  acc_steps, mesh=mesh,
                                  with_rng=hf_internal_dropout)

    def _eval_fn(frozen, trainable, batch):
        x = normalize_clip(batch["image"], compute_dtype)
        feat = blip2.qformer_cls_feature(frozen, x, cfg).astype(jnp.float32)
        preds = jnp.argmax(nn.linear(trainable["classifier"], feat),
                           axis=-1).astype(jnp.int32)
        return preds, jnp.sum((preds == batch["label"]) * batch["valid"])

    if mesh is None:
        _eval_step = jax.jit(_eval_fn)
    else:
        # dp eval like the other test CLIs (params replicated, batch
        # sharded over axis 'data')
        from ..parallel.mesh import batch_sharding, replicated_sharding
        bsh, rsh = batch_sharding(mesh), replicated_sharding(mesh)
        shard = {k: bsh for k in BATCH_KEYS}
        _eval_step = jax.jit(_eval_fn, in_shardings=(None, rsh, shard),
                             out_shardings=(bsh, rsh))

    if hf_internal_dropout:
        def train_step(trainable, opt_state, batch, rng):
            return _train_step(params, trainable, opt_state, batch, rng)
    else:
        def train_step(trainable, opt_state, batch, rng=None):
            return _train_step(params, trainable, opt_state, batch)

    def eval_step(trainable, batch):
        return _eval_step(params, trainable, batch)

    return opt, train_step, eval_step


def main(argv=None):
    args = args_parser(argv)
    cfg, params, lora, tok = build_blip2(args, with_lora=False)

    from ..data.manifest import build_manifest
    train_m = build_manifest(args.dataset_folder_name + TRAIN_SUFFIX)
    val_m = build_manifest((args.dataset_folder_name_val or
                            args.dataset_folder_name) + VAL_SUFFIX)
    train_b = Blip2Batcher(train_m, tok, workers=args.data_workers)
    val_b = Blip2Batcher(val_m, tok, workers=args.data_workers)

    from ..parallel.mesh import mesh_for_batch, shard_params
    mesh = mesh_for_batch(args.mesh_shape, args.batch_size)
    vlm_multihost_mesh_check(mesh)   # pipe meshes are single-process only
    params = place_blip2_params(mesh, params)

    trainable = shard_params(mesh, {"classifier": blip2.init_classifier(
        jax.random.PRNGKey(args.seed + 2), cfg)})
    opt, train_step, eval_step = make_steps(
        cfg, params, mesh=mesh,
        compute_dtype=jnp_compute_dtype(args.compute_dtype),
        hf_internal_dropout=args.hf_internal_dropout)
    opt_state = shard_params(mesh, opt.init(jax.device_get(trainable)))
    logger = MetricsLogger(args.name or "qformer_cls", use_wandb=args.wandb,
                           config=vars(args))

    def evaluate(trainable, batcher, manifest):
        acc, _, _ = vlm_eval(eval_step, trainable, batcher,
                             args.batch_size, mesh, len(manifest),
                             prefetch_depth=args.prefetch_depth)
        return acc

    best = PhaseResult(0.0, 0, None)
    start_epoch = 0
    # full resume (--resume_from=.../RESUME): classifier + opt state +
    # epoch (this loop draws no RNG; the constant seed key is saved for
    # payload-shape parity with the other trainers)
    resume = maybe_load_resume(args.resume_from)
    start_step, resume_losses = 0, []
    if resume is not None:
        trainable = shard_params(mesh, resume["params"])
        opt_state = shard_params(mesh, restore_opt_state(
            opt, jax.device_get(trainable), resume["opt_state"]))
        m = resume["meta"]
        start_step = int(m.get("step", 0) or 0)
        start_epoch = int(m["epoch"]) + (0 if start_step else 1)
        resume_losses = [float(l) for l in (m.get("losses") or [])]
        best = PhaseResult(float(m["best_val_acc"]), int(m["best_epoch"]),
                           m["best_path"] or None)
        print(f"Full-resume from {args.resume_from} (epoch={m['epoch']}"
              + (f" step {start_step}" if start_step else "") + ")")
    # reference semantics: --batch_size is the DataLoader (micro)batch and
    # the optimizer steps every 8 of them (q_former_training.py:241,299)
    from ..parallel.multihost import is_primary
    primary = is_primary()   # side effects (saves, prints) on process 0
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        losses = []
        stream = vlm_train_stream(train_b, args.batch_size, QF_ACC, mesh,
                                  seed=args.seed + epoch,
                                  prefetch_depth=args.prefetch_depth)
        skip = 0
        if epoch == start_epoch and start_step > 0:
            # mid-epoch resume (--resume_every_steps): the stream is
            # deterministic per seed+epoch, skip the completed windows
            import math
            n_windows = math.ceil(math.ceil(len(train_m) / args.batch_size)
                                  / QF_ACC)
            if start_step > n_windows:
                # stale RESUME / changed batch geometry would silently
                # exhaust the islice (ADVICE r4)
                raise SystemExit(
                    f"RESUME step {start_step} > {n_windows} optimizer "
                    f"windows in epoch {epoch} — stale RESUME dir or "
                    "changed --batch_size/dataset? Delete the RESUME "
                    "directory to start the epoch over.")
            skip, losses = start_step, list(resume_losses)
            import itertools
            stream = itertools.islice(stream, skip, None)
        for w, stacked in enumerate(stream):
            # per-window key only consumed under --hf_internal_dropout;
            # derived (not carried), so it survives mid-epoch resume
            wkey = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(args.seed), epoch),
                skip + w)
            trainable, opt_state, loss = train_step(trainable, opt_state,
                                                    stacked, wkey)
            losses.append(float(loss))
            done = skip + w + 1
            if args.resume_every_steps and primary \
                    and done % args.resume_every_steps == 0:
                save_train_state(out_root=".",
                                 model_name="qformer_classifier",
                                 params=trainable, state={},
                                 opt_state=opt_state,
                                 rng=jax.random.PRNGKey(args.seed),
                                 epoch=epoch, phase_name="train",
                                 scheduler=None, best=best, step=done,
                                 losses=losses)
        val_acc = evaluate(trainable, val_b, val_m)
        logger.log({"epoch": epoch, "avg_loss": float(np.mean(losses)),
                    "val_acc": val_acc,
                    "epoch_time_seconds": time.time() - t0})
        if primary:
            print(f"epoch {epoch}: loss={np.mean(losses):.4f} "
                  f"val_acc={val_acc:.2f}")
        if val_acc > best.best_val_acc:
            # every process tracks the same best (val_acc is identical —
            # vlm_eval_multiprocess); only the primary writes
            # (classifier saved separately, q_former_training.py:33-47)
            best = PhaseResult(val_acc, epoch, save_best(
                trainable, {}, model_name="qformer_classifier", epoch=epoch,
                val_acc=val_acc, args=args, fine_tuning=False)
                if primary else best.best_path)
        if primary:
            save_train_state(out_root=".", model_name="qformer_classifier",
                             params=trainable, state={}, opt_state=opt_state,
                             rng=jax.random.PRNGKey(args.seed), epoch=epoch,
                             phase_name="train", scheduler=None, best=best)
    train_b.close()
    val_b.close()
    if primary:
        print(f"best val acc {best.best_val_acc:.2f} "
              f"@ epoch {best.best_epoch}")
    return best


if __name__ == "__main__":
    main()
