"""BLIP-2 LoRA fine-tuning CLI.

Parity with reference blip_2_training.py:176-311:
``python -m ...cli.blip2_train --dataset_folder_name=<base> [flags]``
  * knowledge prompt per image, label = answer word, TTR -> Yellow;
  * LoRA r=32 alpha=8 dropout .05 on OPT q_proj/k_proj (only the adapters
    train — the 3.7B backbone stays frozen);
  * AdamW 5e-4, gradient accumulation 8 (reference :226-229, 280-293);
  * per-epoch train+val accuracy via 1-token constrained decode ->
    find_closest_string -> accuracy/precision/recall/F1;
  * best-val checkpointing of the adapters (orbax; the reference saves the
    full model dict — ours saves the trained leaves, 6000x smaller).

TPU: one jitted LoRA train step (grad wrt adapters only), bf16 backbone.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import args_parser, jnp_compute_dtype
from ..models.vlm import blip2
from ..train.engine import (MetricsLogger, PhaseResult, maybe_load_resume,
                            restore_opt_state, save_best, save_train_state)
from .blip2_common import (BATCH_KEYS, Blip2Batcher, build_blip2,
                           class_logits_from_next_token, iter_accum_windows,
                           make_accum_step, normalize_clip,
                           place_blip2_params)

TRAIN_SUFFIX = "_Train"
VAL_SUFFIX = "_Val"
BLIP2_LR = 5e-4          # reference blip_2_training.py:228
BLIP2_ACC = 8            # reference :229


def make_lora_train_step(cfg, params, acc_steps: int = BLIP2_ACC,
                         mesh=None, compute_dtype=jnp.bfloat16):
    """Grad-accumulating LoRA step: the reference steps AdamW every 8
    microbatches (blip_2_training.py:280-293); here the 8 microbatches are
    one lax.scan inside a single device program. With a mesh, the
    microbatch axis stays replicated and the batch axis is sharded over
    'data' (XLA psums the LoRA grads across chips)."""
    # reference: torch.optim.AdamW(lr=5e-4, eps=1e-05)
    # (blip_2_training.py:228) — torch's default weight_decay is 0.01,
    # where optax's is 1e-4 and its default eps 1e-8, so both must be
    # spelled out for update-rule parity (test_blip2_trajectory.py)
    opt = optax.adamw(BLIP2_LR, eps=1e-5, weight_decay=0.01)

    def loss_fn(lora, frozen, mb):
        x = normalize_clip(mb["image"], compute_dtype)
        # pad label tokens AND batch-padding rows (valid=0 duplicates of
        # sample 0 on the tail batch — the reference's DataLoader just
        # yields a smaller final batch instead) are excluded from the CE.
        # "valid" presence is static under jit; synthetic callers (dryrun,
        # bench) may feed full batches without it.
        pad = mb["label_tokens"] == jnp.int32(1)
        if "valid" in mb:
            pad = pad | (mb["valid"][:, None] == 0)
        labels = jnp.where(pad, -100, mb["label_tokens"])
        ids = jnp.concatenate([mb["input_ids"], mb["label_tokens"]], 1)
        mask = jnp.concatenate(
            [mb["attention_mask"],
             (mb["label_tokens"] != 1).astype(mb["attention_mask"].dtype)],
            1)
        full_labels = jnp.concatenate(
            [jnp.full_like(mb["input_ids"], -100), labels], 1)
        return blip2.lm_loss(frozen, x, ids, mask, full_labels, cfg, lora)

    # accumulation machinery (scan, /acc_steps partial-window semantics,
    # frozen-params-as-jit-arg, mesh shardings) shared with qformer_train
    _step = make_accum_step(jax.value_and_grad(loss_fn), opt, acc_steps,
                            mesh=mesh)

    def step(lora, opt_state, batch, rng):
        del rng
        return _step(params, lora, opt_state, batch)

    step.raw = _step   # (frozen, lora, opt_state, batch) — for callers that
    return opt, step   # nest this in a larger jit (e.g. bench scan loops)


def make_eval_step(cfg, params, answer_first_tokens, mesh=None,
                   compute_dtype=jnp.bfloat16):
    # params as a jit argument, not a captured constant (see _step above)
    def _step_fn(frozen, lora, batch):
        x = normalize_clip(batch["image"], compute_dtype)
        next_logits = blip2.next_token_logits(
            frozen, x, batch["input_ids"], batch["attention_mask"], cfg, lora)
        cls_logits = class_logits_from_next_token(
            next_logits.astype(jnp.float32), answer_first_tokens)
        preds = jnp.argmax(cls_logits, axis=-1).astype(jnp.int32)
        correct = jnp.sum((preds == batch["label"]) * batch["valid"])
        return preds, correct

    if mesh is None:
        _step = jax.jit(_step_fn)
    else:
        # dp over the mesh like the image/text eval CLIs: params
        # replicated, batch sharded on axis 'data'
        from ..parallel.mesh import batch_sharding, replicated_sharding
        bs, rs = batch_sharding(mesh), replicated_sharding(mesh)
        shard = {k: bs for k in BATCH_KEYS}
        _step = jax.jit(_step_fn, in_shardings=(None, rs, shard),
                        out_shardings=(bs, rs))

    def step(lora, batch):
        return _step(params, lora, batch)

    return step


def answer_first_token_table(batcher: Blip2Batcher, classes) -> np.ndarray:
    """first answer-word token id per class index (sorted-folder order)."""
    return np.asarray([batcher.answer_token_ids[c][1]
                       if len(batcher.answer_token_ids[c]) > 1
                       else batcher.answer_token_ids[c][0]
                       for c in classes], np.int32)


def main(argv=None):
    import jax as _jax

    if _jax.process_count() > 1:
        # the VLM loops feed batches with plain device_puts; per-host
        # input sharding is wired for the image/text/fusion CLIs only
        raise SystemExit(
            "multi-host (GC_RCA_MULTIHOST) is not supported by the "
            "BLIP-2/Q-Former CLIs yet — run them single-process "
            "(TP over the model axis via --mesh_shape still applies)")
    args = args_parser(argv)
    cfg, params, lora, tok = build_blip2(args)

    from ..data.manifest import build_manifest
    train_m = build_manifest(args.dataset_folder_name + TRAIN_SUFFIX)
    val_m = build_manifest((args.dataset_folder_name_val or
                            args.dataset_folder_name) + VAL_SUFFIX)
    print(f"train {len(train_m)} / val {len(val_m)}")
    train_b = Blip2Batcher(train_m, tok, workers=args.data_workers)
    val_b = Blip2Batcher(val_m, tok, workers=args.data_workers)
    aft = answer_first_token_table(train_b, train_m.classes)

    from ..parallel.mesh import mesh_for_batch, shard_params
    mesh = mesh_for_batch(args.mesh_shape, args.batch_size)
    params = place_blip2_params(mesh, params)
    lora = shard_params(mesh, lora)

    dtype = jnp_compute_dtype(args.compute_dtype)
    opt, step = make_lora_train_step(cfg, params, mesh=mesh,
                                     compute_dtype=dtype)
    eval_step = make_eval_step(cfg, params, aft, mesh=mesh,
                               compute_dtype=dtype)
    opt_state = shard_params(mesh, opt.init(lora))
    logger = MetricsLogger(args.name or "blip2_lora", use_wandb=args.wandb,
                           config=vars(args))

    def evaluate(lora, batcher, manifest):
        correct = 0
        for batch in batcher.iter_batches(args.batch_size):
            _, c = eval_step(lora, batch)
            correct += int(c)
        return 100.0 * correct / len(manifest)

    best = PhaseResult(0.0, 0, None)
    rng = jax.random.PRNGKey(args.seed)
    start_epoch = 0
    # full resume (--resume_from=.../RESUME): adapters + opt state + RNG
    # stream + epoch — bit-identical continuation, like the image/text
    # trainers' --model_path=RESUME path (--model_path here is the HF
    # base checkpoint, hence the separate flag)
    resume = maybe_load_resume(args.resume_from)
    if resume is not None:
        lora = shard_params(mesh, resume["params"])
        opt_state = shard_params(mesh, restore_opt_state(
            opt, jax.device_get(lora), resume["opt_state"]))
        rng = jnp.asarray(resume["rng"])
        m = resume["meta"]
        start_epoch = int(m["epoch"]) + 1
        best = PhaseResult(float(m["best_val_acc"]), int(m["best_epoch"]),
                           m["best_path"] or None)
        print(f"Full-resume from {args.resume_from} (epoch={m['epoch']})")
    # reference semantics: --batch_size is the DataLoader (micro)batch and
    # the optimizer steps every 8 of them (blip_2_training.py:197-201,229)
    micro = args.batch_size
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        losses = []
        for stacked in iter_accum_windows(train_b, micro, BLIP2_ACC,
                                          shuffle=True,
                                          seed=args.seed + epoch):
            rng, srng = jax.random.split(rng)
            lora, opt_state, loss = step(lora, opt_state, stacked, srng)
            losses.append(float(loss))
        val_acc = evaluate(lora, val_b, val_m)
        logger.log({"epoch": epoch, "avg_loss": float(np.mean(losses)),
                    "val_acc": val_acc,
                    "epoch_time_seconds": time.time() - t0})
        print(f"epoch {epoch}: loss={np.mean(losses):.4f} val_acc={val_acc:.2f}")
        if val_acc > best.best_val_acc:
            best = PhaseResult(val_acc, epoch, save_best(
                {"lora": lora}, {}, model_name="blip2_lora", epoch=epoch,
                val_acc=val_acc, args=args, fine_tuning=False))
        save_train_state(out_root=".", model_name="blip2_lora",
                         params=lora, state={}, opt_state=opt_state,
                         rng=rng, epoch=epoch, phase_name="train",
                         scheduler=None, best=best)
    train_b.close()
    val_b.close()
    print(f"best val acc {best.best_val_acc:.2f} @ epoch {best.best_epoch}")
    return best


if __name__ == "__main__":
    main()
