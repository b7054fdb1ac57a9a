"""Text-model training CLI.

Parity with reference main_text.py:246-611:
``python -m ...cli.main_text --text_model=distilbert
  --dataset_folder_name=<base> [flags]``

Text comes from filename stems / captions CSV; optional synonym
augmentation (--use_synonyms at --prob_aug_text) swaps words via the host
Synonymizer (data/synonymize.py — WordNet-style substitution by default;
the reference's Llama-3.1-8B paraphraser is available as a plug-in when
weights are local, reference synonymizer/synonymizer.py:8-126).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import NUM_CLASSES
from ..config import args_parser, TEXT_ARCHS
from ..data.manifest import build_manifest
from ..data.pipeline import ImageTextBatcher
from ..data.tokenizer import get_tokenizer, resolve_vocab_dir, DEFAULT_SEQ_LEN
from ..data.synonymize import Synonymizer
from ..eval.report import classification_report_dict
from ..models import get_text_model
from ..parallel.fsdp import param_placer
from ..train.engine import MetricsLogger, run_phase
from ..train.loop import all_trainable_mask, head_only_mask, make_train_step
from ..train.optim import PlateauScheduler, make_optimizer
from .test_text import make_text_eval_step

TRAIN_SUFFIX = "_Train"
VAL_SUFFIX = "_Val"

# exactly the replaced Linear per tower (reference text_models.py freezes
# the rest: BART's classification_head.dense and MobileBERT's pooler stay
# frozen — only out_proj / classifier are swapped, :116-117, :172-173)
HEAD_KEYS_BY_MODEL = {
    "bart": ("head_out",),
    "gpt2": ("score",),
    "mobilebert": ("classifier",),
}
HEAD_KEYS_DEFAULT = ("head",)


def head_keys_for(model: str):
    return HEAD_KEYS_BY_MODEL.get(model, HEAD_KEYS_DEFAULT)


class SynonymBatcher(ImageTextBatcher):
    """Applies host-side synonym augmentation before tokenizing
    (reference main_text.py:111-126 re-tokenizes augmented text)."""

    def __init__(self, *a, synonymizer=None, prob=0.0, seed=0, **kw):
        super().__init__(*a, **kw)
        self.syn = synonymizer
        self.prob = prob
        self.rng = np.random.default_rng(seed)

    def make_batch(self, indices, batch_size):
        batch = super().make_batch(indices, batch_size)
        if self.syn is not None and self.rng.random() < self.prob:
            n = len(indices)
            texts = [self.syn.augment(
                self.m.samples[i].effective_text(self.extended))
                for i in indices]
            texts += [""] * (batch_size - n)
            enc = self.tokenizer.encode_batch(texts, self.seq_len)
            batch["input_ids"] = enc.input_ids
            batch["attention_mask"] = enc.attention_mask
        return batch


def main(argv=None):
    args = args_parser(argv)
    if args.opt not in ("sgd", "adamw"):
        print("Invalid optimizer!")   # reference wording, main_image.py:536
        raise SystemExit(1)
    from . import resolve_model, train_mesh
    mdef = resolve_model(get_text_model, args.text_model)
    spec = TEXT_ARCHS[args.text_model]

    mesh = train_mesh(args.mesh_shape, args.batch_size,
                      args.batch_size_FT, args.ft_epochs)
    # --fsdp: params/BN-state/opt-state live sharded over 'data'
    # (ZeRO-3 analog, parallel/fsdp.py); default replicates
    place = param_placer(mesh, args.fsdp)

    train_manifest = build_manifest(args.dataset_folder_name + TRAIN_SUFFIX,
                                    extended_desc=args.extended_desc_train)
    val_manifest = build_manifest((args.dataset_folder_name_val or
                                   args.dataset_folder_name) + VAL_SUFFIX,
                                  extended_desc=args.extended_desc_val)
    print(f"Len of train set: {len(train_manifest)}")
    print(f"Len of val set: {len(val_manifest)}")
    class_weights = train_manifest.class_weights() if args.balance_weights else None

    tok = get_tokenizer(args.text_model, vocab_dir=resolve_vocab_dir(args))
    syn = None
    if args.use_synonyms:
        # production LLM backend when local weights are provided
        # (reference runs Llama-3.1-8B-Instruct, synonymizer.py:15)
        llm_path = os.environ.get("GC_RCA_LLM_PATH")
        if llm_path:
            from ..data.synonymize import make_hf_llm_fn
            syn = Synonymizer(seed=args.seed,
                              llm_fn=make_hf_llm_fn(llm_path))
            print(f"Synonymizer: HF LLM backend from {llm_path}")
        else:
            syn = Synonymizer(seed=args.seed)
            print("Synonymizer: rule-table backend (set GC_RCA_LLM_PATH "
                  "to local Llama weights for the reference LLM backend)")
    train_batcher = SynonymBatcher(
        train_manifest, (0, 0), tokenizer=tok, seq_len=args.seq_len or DEFAULT_SEQ_LEN,
        extended_desc=args.extended_desc_train is not None,
        workers=args.data_workers, with_images=False,
        synonymizer=syn, prob=args.prob_aug_text, seed=args.seed)
    val_batcher = ImageTextBatcher(
        val_manifest, (0, 0), tokenizer=tok, seq_len=args.seq_len or DEFAULT_SEQ_LEN,
        extended_desc=args.extended_desc_val is not None,
        workers=args.data_workers, with_images=False)

    from ..train.engine import ResumePlan, maybe_load_resume
    plan = ResumePlan(maybe_load_resume(args.model_path))
    if plan.resume is not None:
        params, state = plan.resume["params"], plan.resume["state"]
        print(f"Full-resume from {args.model_path} "
              f"(phase={plan.resume['meta']['phase_name']} "
              f"epoch={plan.resume['meta']['epoch']})")
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

    def batch_to_inputs(mb, rng=None):
        return (mb["input_ids"], mb["attention_mask"])

    train_apply = mdef.apply
    if args.hf_internal_dropout:
        # reference towers stay in train() mode -> HF-internal p=0.1
        # dropout active during training (text_models.py:23-34)
        import functools
        train_apply = functools.partial(mdef.apply, hf_internal_dropout=True)

    def make_step(mask, lr):
        opt = make_optimizer(args.opt, lr, args.reg, mask)
        step = make_train_step(train_apply, opt, class_weights=class_weights,
                               label_smoothing=args.label_smoothing,
                               compute_dtype=jnp.float32, mesh=mesh,
                               batch_to_inputs=batch_to_inputs, donate=True,
                               log_norms=True)
        return opt, step

    eval_step = make_text_eval_step(mdef.apply, mesh,
                                    text_model=args.text_model)

    def eval_fn(params, state):
        from ..parallel.mesh import clamp_eval_batch
        bs = clamp_eval_batch(spec.eval_batch, len(val_manifest), mesh)
        if jax.process_count() > 1:
            # multi-host: per-host input shards, identical output stream
            from ..parallel.multihost import run_eval_multiprocess
            acc, labels, preds, _ = run_eval_multiprocess(
                eval_step, params, state, val_batcher, bs, mesh,
                keys=("input_ids", "attention_mask", "label", "valid"),
                progress=False)
            return acc, classification_report_dict(labels, preds)
        correct, all_p, all_l = 0, [], []
        for batch in val_batcher.iter_batches(bs):
            preds, c = eval_step(params, state, batch)
            correct += int(c)
            valid = np.asarray(batch["valid"]).astype(bool)
            all_p.append(np.asarray(preds)[valid])
            all_l.append(np.asarray(batch["label"])[valid])
        acc = 100.0 * correct / len(val_manifest)
        return acc, classification_report_dict(np.concatenate(all_l),
                                               np.concatenate(all_p))

    logger = MetricsLogger(args.name or f"text_{args.text_model}",
                           use_wandb=args.wandb, config=vars(args))

    best = None
    if plan.skip_phase1:
        best = plan.initial_best()
        print("Resume targets fine_tune phase; skipping phase 1")
    else:
        mask = head_only_mask(params, head_keys_for(args.text_model)) \
            if args.tl else all_trainable_mask(params)
        opt, step = make_step(mask, args.lr)
        opt_state = place(plan.opt_state("train", opt, params))
        params, state, opt_state, best = run_phase(
            phase_name="train", epochs=args.epochs, params=params,
            state=state, opt=opt, opt_state=opt_state, train_step=step,
            eval_fn=eval_fn, batcher=train_batcher,
            batch_size=args.batch_size,
            acc_steps=args.acc_steps, args=args, mesh=mesh,
            model_name=args.text_model, logger=logger,
            balanced_sampler=args.balanced_sampler,
            keys=("input_ids", "attention_mask", "label", "valid"),
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
            args=args, mesh=mesh, model_name=args.text_model, logger=logger,
            scheduler=sched, best=best,
            balanced_sampler=args.balanced_sampler, fine_tuning=True,
            keys=("input_ids", "attention_mask", "label", "valid"),
            save_resume=True, resume=plan.for_phase("fine_tune"),
            keep_top_k=3)

    train_batcher.close()
    val_batcher.close()
    print(f"Best epoch: {best.best_epoch}, best val acc: {best.best_val_acc:.5f}")
    return best


if __name__ == "__main__":
    main()
