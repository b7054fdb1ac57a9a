"""Multimodal training CLI.

Parity with reference main_both.py:236-834:
``python -m ...cli.main_both --late_fusion=MM_RCA --reverse
  --text_model=distilbert --dataset_folder_name=<base> [flags]``

Two-phase schedule like main_image; multimodal specifics:
  * per-epoch ablation evals — val accuracy with both / image_only /
    text_only modes (main_both.py:43-47, 635-667);
  * modality dropout inside the fusion forward (train mode only — and
    unlike the reference, val during training runs in eval mode; the
    reference's stochastic-val quirk is a recorded defect, SURVEY §2);
  * optional imbalanced sampler on the train loader (--balanced_sampler);
  * fine-tune phase unfreezes both towers (main_both.py:690-697).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import args_parser, jnp_compute_dtype, MULTIMODAL_IMAGE_SIZE
from ..data.augment import augment_batch
from ..data.images import normalize_on_device
from ..data.manifest import build_manifest
from ..data.pipeline import ImageTextBatcher, device_prefetch
from ..data.tokenizer import get_tokenizer, resolve_vocab_dir, DEFAULT_SEQ_LEN
from ..eval.report import classification_report_dict
from ..models.fusion import build_fusion
from ..parallel.fsdp import param_placer
from ..train.engine import MetricsLogger, run_phase
from ..train.loop import all_trainable_mask, make_train_step
from ..train.optim import PlateauScheduler, make_optimizer
from .test_both import fusion_config_from_args, make_both_eval_step

TRAIN_SUFFIX = "_Train"
VAL_SUFFIX = "_Val"


def _image_size():
    """480x480 (multimodal_model.py:407-408). GC_RCA_MM_IMAGE_SIZE overrides
    for hermetic CI drives (hierarchical pooling requires the real 480)."""
    env = os.environ.get("GC_RCA_MM_IMAGE_SIZE")
    return (int(env), int(env)) if env else MULTIMODAL_IMAGE_SIZE

# phase-1 trainable heads: everything except the two towers
TOWER_KEYS = ("text", "image")


def fusion_head_mask(params):
    return {k: jax.tree_util.tree_map(lambda _: k not in TOWER_KEYS, v)
            for k, v in params.items()}


def main(argv=None):
    args = args_parser(argv)
    if args.opt not in ("sgd", "adamw"):
        print("Invalid optimizer!")   # reference wording, main_image.py:536
        raise SystemExit(1)
    cfg = fusion_config_from_args(args)
    from ..config import LATE_FUSION_STRATEGIES
    if args.late_fusion not in LATE_FUSION_STRATEGIES:
        print("Wrong late fusion strategy: ", args.late_fusion)  # reference main_both.py:342
        raise SystemExit(1)
    # other ValueErrors (e.g. hierarchical+bart incompatibility) propagate
    # with their specific message instead of being mislabeled here
    init_fn, apply_fn, _ = build_fusion(cfg)

    from . import train_mesh
    mesh = train_mesh(args.mesh_shape, args.batch_size,
                      args.batch_size_FT, args.ft_epochs)
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

    tok = get_tokenizer(args.text_model, vocab_dir=resolve_vocab_dir(args))
    train_batcher = ImageTextBatcher(
        train_manifest, _image_size(), tokenizer=tok,
        seq_len=args.seq_len or DEFAULT_SEQ_LEN,
        extended_desc=args.extended_desc_train is not None,
        workers=args.data_workers)
    val_batcher = ImageTextBatcher(
        val_manifest, _image_size(), tokenizer=tok,
        seq_len=args.seq_len or DEFAULT_SEQ_LEN,
        extended_desc=args.extended_desc_val is not None,
        workers=args.data_workers)

    from ..train.engine import ResumePlan, maybe_load_resume
    plan = ResumePlan(maybe_load_resume(args.model_path))
    if plan.resume is not None:
        params, state = plan.resume["params"], plan.resume["state"]
        print(f"Full-resume from {args.model_path} "
              f"(phase={plan.resume['meta']['phase_name']} "
              f"epoch={plan.resume['meta']['epoch']})")
    elif args.model_path and os.path.isdir(args.model_path):
        from ..train.engine import load_orbax
        params, state = load_orbax(args.model_path)
        print(f"Resumed weights from {args.model_path}")
    elif args.model_path:
        from ..checkpoint.torch_convert import (convert_checked,
                                                load_torch_state_dict)
        _, _, convert_fn = build_fusion(cfg)
        params, state = convert_checked(
            convert_fn, load_torch_state_dict(args.model_path),
            f"--late_fusion={args.late_fusion}/--text_model={args.text_model}")
        print(f"Warm-started from torch checkpoint {args.model_path}")
    else:
        params, state = init_fn(jax.random.PRNGKey(args.seed))
    from ..utils.dtype import cast_for_training
    # fp32 master weights unless --param_dtype overrides (bf16 halves
    # param HBM; optimizer moments follow via opt.init); full resume
    # keeps the checkpoint dtype when the flag is left empty
    params = cast_for_training(args, params, plan.resume is not None)
    params = place(params)
    state = place(state)

    def fusion_apply(p, s, x, *, train=False, rng=None):
        # adapter: train step hands us the preprocessed tuple
        return apply_fn(p, s, x, train=train, rng=rng)

    def batch_to_inputs(mb, rng=None):
        x = mb["image"]
        if rng is not None and args.prob_aug > 0:
            x = augment_batch(rng, x, args.prob_aug)
        return (mb["input_ids"], mb["attention_mask"],
                normalize_on_device(x, dtype=dtype))

    def make_step(mask, lr):
        opt = make_optimizer(args.opt, lr, args.reg, mask)
        step = make_train_step(fusion_apply, opt, class_weights=class_weights,
                               label_smoothing=args.label_smoothing,
                               compute_dtype=dtype, mesh=mesh,
                               batch_to_inputs=batch_to_inputs, donate=True,
                               log_norms=True)
        return opt, step

    eval_step_cache = {}

    def mode_eval(params, state, remove_image=False, remove_text=False,
                  with_report=False):
        key = (remove_image, remove_text)
        if key not in eval_step_cache:
            def _apply(p, s, b, *, train=False, eval_mode=True, **kw):
                return apply_fn(p, s, b, train=False, eval_mode=True,
                                remove_image=remove_image,
                                remove_text=remove_text)
            eval_step_cache[key] = make_both_eval_step(_apply, mesh, dtype)
        step = eval_step_cache[key]
        # the CLIP head's FC is batch-sized (reference multimodal_model.py
        # :620-623): validation must run at exactly cfg.batch_size; tail
        # padding keeps the trans_conv pad hack from firing
        from ..parallel.mesh import clamp_eval_batch
        eval_bs = (cfg.batch_size if cfg.strategy == "clip"
                   else clamp_eval_batch(args.eval_batch_size or 32,
                                         len(val_manifest), mesh))
        if jax.process_count() > 1:
            # multi-host: per-host input shards, identical output stream
            from ..parallel.multihost import run_eval_multiprocess
            acc, labels, preds, _ = run_eval_multiprocess(
                step, params, state, val_batcher, eval_bs, mesh,
                keys=("image", "input_ids", "attention_mask", "label",
                      "valid"), progress=False)
            if with_report:
                return acc, classification_report_dict(labels, preds)
            return acc
        correct, all_p, all_l = 0, [], []
        for batch in device_prefetch(
                val_batcher.iter_batches(eval_bs), mesh,
                depth=args.prefetch_depth):
            preds, c = step(params, state, batch)
            correct += int(c)
            valid = np.asarray(batch["valid"]).astype(bool)
            all_p.append(np.asarray(preds)[valid])
            all_l.append(np.asarray(batch["label"])[valid])
        acc = 100.0 * correct / len(val_manifest)
        if with_report:
            return acc, classification_report_dict(
                np.concatenate(all_l), np.concatenate(all_p))
        return acc

    def eval_fn(params, state):
        return mode_eval(params, state, with_report=True)

    extra_evals = {
        "val_acc_image_only": lambda p, s: mode_eval(p, s, remove_text=True),
        "val_acc_text_only": lambda p, s: mode_eval(p, s, remove_image=True),
    }

    model_name = f"{args.late_fusion}_{args.text_model}"
    logger = MetricsLogger(args.name or f"both_{model_name}",
                           use_wandb=args.wandb, config=vars(args))

    best = None
    if plan.skip_phase1:
        best = plan.initial_best()
        print("Resume targets fine_tune phase; skipping phase 1")
    else:
        opt, step = make_step(fusion_head_mask(params), args.lr)
        opt_state = place(plan.opt_state("train", opt, params))
        params, state, opt_state, best = run_phase(
            phase_name="train", epochs=args.epochs, params=params,
            state=state, opt=opt, opt_state=opt_state, train_step=step,
            eval_fn=eval_fn, batcher=train_batcher,
            batch_size=args.batch_size,
            acc_steps=args.acc_steps, args=args, mesh=mesh,
            model_name=model_name, logger=logger,
            balanced_sampler=args.balanced_sampler, extra_evals=extra_evals,
            save_resume=True, resume=plan.for_phase("train"), keep_top_k=3)

    if args.ft_epochs > 0:
        ft_lr = args.lr / args.fraction_lr
        opt, step = make_step(all_trainable_mask(params), ft_lr)
        opt_state = place(opt.init(jax.device_get(params)))
        sched = PlateauScheduler(ft_lr, factor=0.4)  # reference main_both.py:560 / main_text.py:434 (0.2 is main_image's)
        if plan.for_phase("fine_tune") is not None:
            opt_state = place(plan.opt_state("fine_tune", opt, params))
        params, state, opt_state, best = run_phase(
            phase_name="fine_tune", epochs=args.ft_epochs, params=params,
            state=state, opt=opt, opt_state=opt_state, train_step=step,
            eval_fn=eval_fn, batcher=train_batcher,
            batch_size=args.batch_size_FT, acc_steps=args.acc_steps_FT,
            args=args, mesh=mesh, model_name=model_name, logger=logger,
            scheduler=sched, best=best,
            balanced_sampler=args.balanced_sampler, extra_evals=extra_evals,
            fine_tuning=True, save_resume=True,
            resume=plan.for_phase("fine_tune"), keep_top_k=3)

    train_batcher.close()
    val_batcher.close()
    print(f"Best epoch: {best.best_epoch}, best val acc: {best.best_val_acc:.5f}")
    return best


if __name__ == "__main__":
    main()
