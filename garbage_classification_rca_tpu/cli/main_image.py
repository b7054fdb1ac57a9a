"""Image-model training CLI.

Parity with reference main_image.py:241-711:
``python -m garbage_classification_rca_tpu.cli.main_image
  --image_model=eff_v2_medium --dataset_folder_name=<base> [flags]``

Dataset layout matches the reference: ``<base>_Train/`` and ``<base>_Val/``
class folders (main_image.py:63-64, 478-489). Two-phase schedule: phase 1
head-only (frozen backbone iff --tl) for --epochs; phase 2 full fine-tune
at lr/--fraction_lr for --ft_epochs with plateau LR on val acc; weighted
CE (--balance_weights), label smoothing, gradient accumulation
(--acc_steps/--acc_steps_FT), best-val checkpointing with reference-style
filenames, JSONL metrics (+ optional wandb).

Augmentation note: train-time augmentation runs on device inside the train
step (data/augment.py) at --prob_aug, replacing the reference's host-side
albumentations stack with a jitted equivalent.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import NUM_CLASSES
from ..config import args_parser, jnp_compute_dtype, IMAGE_ARCHS
from ..data.augment import augment_batch
from ..data.images import normalize_on_device
from ..data.manifest import build_manifest
from ..data.pipeline import ImageTextBatcher
from ..eval.harness import run_image_eval
from ..models import get_image_model
from ..parallel.fsdp import param_placer
from ..train.engine import MetricsLogger, run_phase
from ..train.loop import all_trainable_mask, head_only_mask, make_train_step
from ..train.optim import PlateauScheduler, make_optimizer

TRAIN_SUFFIX = "_Train"
VAL_SUFFIX = "_Val"

# head param subtrees that stay trainable in phase 1 = exactly the replaced
# classifier Linear per arch (reference models.py freezes everything else,
# including MobileNetV3's classifier[0] Linear -> only our fc2 trains there)
HEAD_KEYS = {
    "mb": ("fc2",),
    "default": ("classifier", "fc", "head"),
}


def head_keys_for(arch: str):
    return HEAD_KEYS.get(arch, HEAD_KEYS["default"])


def main(argv=None):
    args = args_parser(argv)
    if args.opt not in ("sgd", "adamw"):
        print("Invalid optimizer!")   # reference wording, main_image.py:536
        raise SystemExit(1)
    if args.hf_internal_dropout:
        # the flag reproduces HF-*text*-encoder-internal dropout; the image
        # towers have no such sites, so accepting it here would be a silent
        # no-op (ADVICE r4)
        raise SystemExit(
            "--hf_internal_dropout has no effect on image-only training "
            "(it reproduces the HF text/VLM encoders' internal train-mode "
            "dropout) — it is consumed by main_text/main_both/blip2_train/"
            "qformer_train only. Remove the flag.")
    from . import resolve_model, train_mesh
    mdef = resolve_model(get_image_model, args.image_model)
    spec = IMAGE_ARCHS[args.image_model]
    batch_size = args.batch_size or spec.train_batch
    ft_batch = args.batch_size_FT or spec.ft_batch

    mesh = train_mesh(args.mesh_shape, batch_size, ft_batch,
                      args.ft_epochs)
    # --fsdp: params/BN-state/opt-state live sharded over 'data'
    # (ZeRO-3 analog, parallel/fsdp.py); default replicates
    place = param_placer(mesh, args.fsdp)
    dtype = jnp_compute_dtype(args.compute_dtype)

    train_manifest = build_manifest(args.dataset_folder_name + TRAIN_SUFFIX,
                                    extended_desc=args.extended_desc_train)
    val_manifest = build_manifest((args.dataset_folder_name_val or
                                   args.dataset_folder_name) + VAL_SUFFIX,
                                  extended_desc=args.extended_desc_val)
    print(f"Len of train set: {len(train_manifest)}")
    print(f"Len of val set: {len(val_manifest)}")
    class_weights = train_manifest.class_weights() if args.balance_weights else None
    print(f"Class weights: {train_manifest.class_weights()}")

    norm_stats = None
    if args.calculate_dataset_stats:
        # reference main_image.py:427-431: compute train-set channel stats
        # and normalize with them instead of ImageNet stats
        from .calculate_mean_std import compute_stats
        print("Calculating Train Dataset statistics...")
        mean, std, _ = compute_stats(args.dataset_folder_name + TRAIN_SUFFIX,
                                     spec.input_size)
        norm_stats = (mean.astype("float32"), std.astype("float32"))
        print(f"Mean Train Dataset: {mean}, STD Train Dataset: {std}")

    from ..train.engine import ResumePlan, maybe_load_resume
    plan = ResumePlan(maybe_load_resume(args.model_path))
    if plan.resume is not None:
        # FULL resume: params + opt_state + scheduler + epoch + RNG
        params, state = plan.resume["params"], plan.resume["state"]
        print(f"Full-resume from {args.model_path} "
              f"(phase={plan.resume['meta']['phase_name']} "
              f"epoch={plan.resume['meta']['epoch']})")
    elif args.model_path and os.path.isdir(args.model_path):
        # warm-start from one of our orbax BEST checkpoints (params only;
        # the reference has no resume path — SURVEY §5 gap-fill)
        from ..train.engine import load_orbax
        params, state = load_orbax(args.model_path)
        print(f"Resumed weights from {args.model_path}")
    elif args.model_path:
        from ..checkpoint.torch_convert import (convert_checked,
                                                load_torch_state_dict)
        params, state = convert_checked(
            mdef.convert_torch, load_torch_state_dict(args.model_path),
            f"--image_model={args.image_model}", num_classes=NUM_CLASSES)
        print(f"Warm-started from torch checkpoint {args.model_path}")
    else:
        params, state = mdef.init(jax.random.PRNGKey(args.seed),
                                  num_classes=NUM_CLASSES)
    from ..utils.dtype import cast_for_training
    # fp32 master weights unless --param_dtype overrides (bf16 halves
    # param HBM; optimizer moments follow via opt.init); full resume
    # keeps the checkpoint dtype when the flag is left empty
    params = cast_for_training(args, params, plan.resume is not None)
    params = place(params)
    state = place(state)

    train_batcher = ImageTextBatcher(train_manifest, spec.input_size,
                                     workers=args.data_workers)
    val_batcher = ImageTextBatcher(val_manifest, spec.input_size,
                                   workers=args.data_workers)

    def batch_to_inputs(mb, rng=None):
        x = mb["image"]
        if rng is not None and args.prob_aug > 0:
            x = augment_batch(rng, x, args.prob_aug)
        mean, std = norm_stats if norm_stats else (None, None)
        return normalize_on_device(x, mean=mean, std=std, dtype=dtype)

    def make_step(trainable_mask, lr, acc):
        opt = make_optimizer(args.opt, lr, args.reg, trainable_mask)
        step = make_train_step(
            mdef.apply, opt, class_weights=class_weights,
            label_smoothing=args.label_smoothing, compute_dtype=dtype,
            mesh=mesh, batch_to_inputs=batch_to_inputs, donate=True,
            log_norms=True)
        return opt, step

    def eval_fn_factory(bs):
        from ..parallel.mesh import clamp_eval_batch
        bs = clamp_eval_batch(bs, len(val_manifest), mesh)

        def eval_fn(params, state):
            from ..eval.report import classification_report_dict
            acc, labels, preds, _ = run_image_eval(
                mdef.apply, params, state, val_batcher, bs, mesh, dtype,
                progress=False, norm_stats=norm_stats,
                prefetch_depth=args.prefetch_depth)
            return acc, classification_report_dict(labels, preds)
        return eval_fn

    logger = MetricsLogger(args.name or f"image_{args.image_model}",
                           use_wandb=args.wandb, config=vars(args))

    # phase 1 — frozen backbone iff --tl (models.py:18-24)
    best = None
    if plan.skip_phase1:
        best = plan.initial_best()
        print("Resume targets fine_tune phase; skipping phase 1")
    else:
        mask = head_only_mask(params, head_keys_for(args.image_model)) \
            if args.tl else all_trainable_mask(params)
        opt, step = make_step(mask, args.lr, args.acc_steps)
        opt_state = place(plan.opt_state("train", opt, params))
        params, state, opt_state, best = run_phase(
            phase_name="train", epochs=args.epochs, params=params,
            state=state, opt=opt, opt_state=opt_state, train_step=step,
            eval_fn=eval_fn_factory(spec.eval_batch), batcher=train_batcher,
            batch_size=batch_size, acc_steps=args.acc_steps, args=args,
            mesh=mesh, model_name=args.image_model, logger=logger,
            balanced_sampler=args.balanced_sampler,
            save_resume=True, resume=plan.for_phase("train"), keep_top_k=3)

    # phase 2 — unfreeze all at lr/fraction_lr with plateau scheduling
    if args.ft_epochs > 0:
        ft_lr = args.lr / args.fraction_lr
        opt, step = make_step(all_trainable_mask(params), ft_lr,
                              args.acc_steps_FT)
        opt_state = place(opt.init(jax.device_get(params)))
        sched = PlateauScheduler(ft_lr, factor=0.2)
        if plan.for_phase("fine_tune") is not None:
            opt_state = place(plan.opt_state("fine_tune", opt, params))
        params, state, opt_state, best = run_phase(
            phase_name="fine_tune", epochs=args.ft_epochs, params=params,
            state=state, opt=opt, opt_state=opt_state, train_step=step,
            eval_fn=eval_fn_factory(spec.eval_batch), batcher=train_batcher,
            batch_size=ft_batch, acc_steps=args.acc_steps_FT, args=args,
            mesh=mesh, model_name=args.image_model, logger=logger,
            scheduler=sched, best=best, balanced_sampler=args.balanced_sampler,
            fine_tuning=True, save_resume=True,
            resume=plan.for_phase("fine_tune"), keep_top_k=3)

    train_batcher.close()
    val_batcher.close()
    print(f"Best epoch: {best.best_epoch}, best val acc: {best.best_val_acc:.5f}")
    return best


if __name__ == "__main__":
    main()
