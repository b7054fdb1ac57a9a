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
Scaling: ``--mesh_shape=data:D`` dp-shards the batch;
``--mesh_shape=data:1,model:M`` Megatron-TP-shards the OPT tower;
``--mesh_shape=data:D,pipe:S`` GPipe-pipelines the OPT decoder over S
stages (parallel/pp.py — decoder params stage-sharded, replicated copy
dropped; losses equal the dp run to fp noise). BEST adapters are always
saved in the portable per-layer form; pp RESUME payloads are
stage-stacked and resume on the same pipe size.
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
                           class_logits_from_next_token, make_accum_step,
                           normalize_clip, place_blip2_params,
                           setup_pipeline, vlm_eval,
                           vlm_multihost_mesh_check, vlm_train_stream)

TRAIN_SUFFIX = "_Train"
VAL_SUFFIX = "_Val"
BLIP2_LR = 5e-4          # reference blip_2_training.py:228
BLIP2_ACC = 8            # reference :229


def _assemble_lm_batch(mb, compute_dtype):
    """Microbatch dict -> (pixels, ids, mask, full_labels) for the LM CE.

    Pad label tokens AND batch-padding rows (valid=0 duplicates of
    sample 0 on the tail batch — the reference's DataLoader just yields a
    smaller final batch instead) are excluded from the CE. "valid"
    presence is static under jit; synthetic callers (dryrun, bench) may
    feed full batches without it. Shared by the dp/tp and GPipe train
    steps so the label semantics cannot drift."""
    x = normalize_clip(mb["image"], compute_dtype)
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
    return x, ids, mask, full_labels


# reference: torch.optim.AdamW(lr=5e-4, eps=1e-05)
# (blip_2_training.py:228) — torch's default weight_decay is 0.01,
# where optax's is 1e-4 and its default eps 1e-8, so both must be
# spelled out for update-rule parity (test_blip2_trajectory.py)
def _blip2_adamw():
    return optax.adamw(BLIP2_LR, eps=1e-5, weight_decay=0.01)


def make_lora_train_step(cfg, params, acc_steps: int = BLIP2_ACC,
                         mesh=None, compute_dtype=jnp.bfloat16,
                         hf_internal_dropout: bool = False):
    """Grad-accumulating LoRA step: the reference steps AdamW every 8
    microbatches (blip_2_training.py:280-293); here the 8 microbatches are
    one lax.scan inside a single device program. With a mesh, the
    microbatch axis stays replicated and the batch axis is sharded over
    'data' (XLA psums the LoRA grads across chips).

    ``hf_internal_dropout``: reproduce the reference trainer's stochastic
    internals (Q-Former/OPT p=0.1 dropout + peft lora_dropout=0.05 — the
    peft model runs in train() mode there); the per-microbatch rng the
    step already receives is threaded into blip2.lm_loss."""
    opt = _blip2_adamw()

    if hf_internal_dropout:
        def loss_fn(lora, frozen, mb, rng):
            x, ids, mask, full_labels = _assemble_lm_batch(mb, compute_dtype)
            return blip2.lm_loss(frozen, x, ids, mask, full_labels, cfg,
                                 lora, rng=rng, hf_internal_dropout=True)
    else:
        def loss_fn(lora, frozen, mb):
            x, ids, mask, full_labels = _assemble_lm_batch(mb, compute_dtype)
            return blip2.lm_loss(frozen, x, ids, mask, full_labels, cfg, lora)

    # accumulation machinery (scan, /acc_steps partial-window semantics,
    # frozen-params-as-jit-arg, mesh shardings) shared with qformer_train
    _step = make_accum_step(jax.value_and_grad(loss_fn), opt, acc_steps,
                            mesh=mesh, with_rng=hf_internal_dropout)

    if hf_internal_dropout:
        def step(lora, opt_state, batch, rng):
            return _step(params, lora, opt_state, batch, rng)
    else:
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


def pick_pp_microbatches(batch_size: int, mesh) -> int:
    """Largest pipeline microbatch count M <= 4x the pipe-axis size with
    batch % M == 0 and (batch/M) % data-axis == 0 (pp_decode_hidden's
    divisibility contract). More microbatches shrink the GPipe bubble
    (utilization M/(M+S-1): S stages, M=4S -> ~80-94%); the 4S cap keeps
    each microbatch large enough to feed the MXU — past it the bubble
    win is <5% while per-microbatch matmuls keep shrinking."""
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    s, d = sizes.get("pipe", 1), sizes.get("data", 1)
    for m in range(min(batch_size, 4 * s), 0, -1):
        if batch_size % m == 0 and (batch_size // m) % d == 0:
            return m
    return 1


def make_pp_lora_train_step(cfg, params, stage_layers, mesh,
                            n_microbatches: int, acc_steps: int = BLIP2_ACC,
                            compute_dtype=jnp.bfloat16, remat: bool = True):
    """The GPipe twin of make_lora_train_step: --mesh_shape=...,pipe:S
    stage-shards the OPT decoder over 'pipe' (parallel/pp.py) while the
    frozen vision/Q-Former towers stay replicated; only the stage-stacked
    LoRA adapters train. Same accumulation scan, same AdamW, same label
    semantics (_assemble_lm_batch) — a pp run's losses equal the dp run's
    to fp noise (tests/test_blip2_cli.py::test_blip2_train_pp_matches_dp).
    """
    from ..parallel import pp as ppp

    opt = _blip2_adamw()

    def loss_fn(stage_lora, frozen, mb):
        fparams, fstages = frozen
        x, ids, mask, full_labels = _assemble_lm_batch(mb, compute_dtype)
        return ppp.pp_blip2_lm_loss(fparams, fstages, stage_lora, x, ids,
                                    mask, full_labels, cfg, mesh,
                                    n_microbatches, remat=remat)

    _step = make_accum_step(jax.value_and_grad(loss_fn), opt, acc_steps,
                            mesh=mesh, inherit_trainable=True)

    def step(stage_lora, opt_state, batch, rng):
        del rng
        return _step((params, stage_layers), stage_lora, opt_state, batch)

    step.raw = _step
    return opt, step


def make_pp_eval_step(cfg, params, stage_layers, answer_first_tokens, mesh,
                      n_microbatches: int, compute_dtype=jnp.bfloat16):
    """1-token constrained decode through the pipeline — the pp twin of
    make_eval_step (same last-valid-index gather as
    blip2.next_token_logits, so left- OR right-padded prompts work)."""
    from ..models.vlm.blip2 import _last_valid_index, prompt_embeds
    from ..models.vlm.opt import lm_head
    from ..parallel import pp as ppp
    from ..parallel.mesh import batch_sharding

    def _step_fn(frozen, stages, stage_lora, batch):
        x = normalize_clip(batch["image"], compute_dtype)
        embeds, mask = prompt_embeds(frozen, x, batch["input_ids"],
                                     batch["attention_mask"], cfg)
        h = ppp.pp_decode_hidden(frozen["opt"], stages, embeds, mask,
                                 cfg.opt, mesh, n_microbatches,
                                 stage_lora=stage_lora,
                                 lora_scale=cfg.lora_scale)
        last = cfg.qformer.n_query + _last_valid_index(
            batch["attention_mask"])
        h_last = h[jnp.arange(h.shape[0]), last]
        next_logits = lm_head(frozen["opt"], h_last)
        cls_logits = class_logits_from_next_token(
            next_logits.astype(jnp.float32), answer_first_tokens)
        preds = jnp.argmax(cls_logits, axis=-1).astype(jnp.int32)
        correct = jnp.sum((preds == batch["label"]) * batch["valid"])
        return preds, correct

    bs = batch_sharding(mesh)
    shard = {k: bs for k in BATCH_KEYS}
    _step = jax.jit(_step_fn, in_shardings=(None, None, None, shard))

    def step(stage_lora, batch):
        return _step(params, stage_layers, stage_lora, batch)

    return step


def answer_first_token_table(batcher: Blip2Batcher, classes) -> np.ndarray:
    """first answer-word token id per class index (sorted-folder order)."""
    return np.asarray([batcher.answer_token_ids[c][1]
                       if len(batcher.answer_token_ids[c]) > 1
                       else batcher.answer_token_ids[c][0]
                       for c in classes], np.int32)


def main(argv=None):
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
    vlm_multihost_mesh_check(mesh)   # pipe meshes are single-process only
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_pipe = sizes.get("pipe", 1)
    dtype = jnp_compute_dtype(args.compute_dtype)
    if n_pipe > 1 and args.hf_internal_dropout:
        raise SystemExit("--hf_internal_dropout is not supported on a pipe "
                         "mesh (the GPipe loss path is deterministic); "
                         "use a data/data,model mesh")
    if n_pipe > 1:
        # GPipe: the OPT decoder lives stage-sharded over 'pipe';
        # adapters train stage-stacked (blip2_common.setup_pipeline)
        params, stage_layers, lora = setup_pipeline(cfg, params, lora,
                                                    mesh)
        n_micro = pick_pp_microbatches(args.batch_size, mesh)
        print(f"GPipe over pipe:{n_pipe}, {n_micro} pipeline microbatches")
        opt, step = make_pp_lora_train_step(cfg, params, stage_layers,
                                            mesh, n_micro,
                                            compute_dtype=dtype)
        eval_step = make_pp_eval_step(cfg, params, stage_layers, aft, mesh,
                                      n_micro, compute_dtype=dtype)
        opt_state = opt.init(lora)      # inherits the stage shardings
    else:
        params = place_blip2_params(mesh, params)
        lora = shard_params(mesh, lora)
        opt, step = make_lora_train_step(
            cfg, params, mesh=mesh, compute_dtype=dtype,
            hf_internal_dropout=args.hf_internal_dropout)
        eval_step = make_eval_step(cfg, params, aft, mesh=mesh,
                                   compute_dtype=dtype)
        opt_state = shard_params(mesh, opt.init(lora))
    logger = MetricsLogger(args.name or "blip2_lora", use_wandb=args.wandb,
                           config=vars(args))

    def evaluate(lora, batcher, manifest):
        acc, _, _ = vlm_eval(eval_step, lora, batcher, args.batch_size,
                             mesh, len(manifest),
                             prefetch_depth=args.prefetch_depth)
        return acc

    best = PhaseResult(0.0, 0, None)
    rng = jax.random.PRNGKey(args.seed)
    start_epoch = 0
    # full resume (--resume_from=.../RESUME): adapters + opt state + RNG
    # stream + epoch — bit-identical continuation, like the image/text
    # trainers' --model_path=RESUME path (--model_path here is the HF
    # base checkpoint, hence the separate flag)
    resume = maybe_load_resume(args.resume_from)
    if resume is not None:
        if n_pipe > 1:
            # pp RESUME payloads are stage-stacked (leading [S] dim) —
            # continuation requires the same pipe size; BEST checkpoints
            # are saved in the portable per-layer form instead
            from ..parallel import pp as ppp
            if all(k.isdigit() for k in resume["params"]):
                raise SystemExit(
                    "--resume_from payload is per-layer (saved by a dp/tp "
                    "run); resume with the same --mesh_shape")
            lead = jax.tree_util.tree_leaves(resume["params"])[0].shape[0]
            if lead != n_pipe:
                raise SystemExit(
                    f"--resume_from was saved with pipe:{lead}; resume "
                    f"with the same mesh (got pipe:{n_pipe})")
            lora = ppp.shard_pipeline_params(mesh, resume["params"])
            # re-place exactly like the fresh opt.init(lora) the step was
            # built against: mu/nu committed on the adapters' pipe
            # shardings, but the scalar AdamW count left UNCOMMITTED —
            # committing it (plain device_put) pins it to one device,
            # which the step's inherit-placement (in_shardings=None) jit
            # rejects against the mesh-committed towers
            fresh = opt.init(lora)
            opt_state = jax.tree_util.tree_map(
                lambda f, h: (jax.device_put(h, f.sharding)
                              if f.committed else jnp.asarray(h)),
                fresh, restore_opt_state(opt, jax.device_get(lora),
                                         resume["opt_state"]))
        else:
            if not all(k.isdigit() for k in resume["params"]):
                # a pipe:N run's RESUME is stage-stacked ({q,k} at the
                # top, layers folded into a leading dim) — loading it on
                # the dp path would silently train with NO adapters
                # (per-layer .get("0") lookups all miss)
                raise SystemExit(
                    "--resume_from payload is stage-stacked (saved by a "
                    "pipe:N run); resume with the same --mesh_shape")
            lora = shard_params(mesh, resume["params"])
            opt_state = shard_params(mesh, restore_opt_state(
                opt, jax.device_get(lora), resume["opt_state"]))
        rng = jnp.asarray(resume["rng"])
        m = resume["meta"]
        start_step = int(m.get("step", 0) or 0)
        # mid-epoch checkpoint (--resume_every_steps): re-enter the same
        # epoch and skip its completed windows (stream is deterministic
        # per seed+epoch); epoch-so-far losses ride in the meta
        start_epoch = int(m["epoch"]) + (0 if start_step else 1)
        resume_losses = [float(l) for l in (m.get("losses") or [])]
        best = PhaseResult(float(m["best_val_acc"]), int(m["best_epoch"]),
                           m["best_path"] or None)
        print(f"Full-resume from {args.resume_from} (epoch={m['epoch']}"
              + (f" step {start_step}" if start_step else "") + ")")
    else:
        start_step, resume_losses = 0, []
    # reference semantics: --batch_size is the DataLoader (micro)batch and
    # the optimizer steps every 8 of them (blip_2_training.py:197-201,229)
    from ..parallel.multihost import is_primary
    primary = is_primary()   # side effects (saves, prints) on process 0
    micro = args.batch_size
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        losses = []
        stream = vlm_train_stream(train_b, micro, BLIP2_ACC, mesh,
                                  seed=args.seed + epoch,
                                  prefetch_depth=args.prefetch_depth)
        skip = 0
        if epoch == start_epoch and start_step > 0:
            import math
            n_windows = math.ceil(math.ceil(len(train_m) / micro)
                                  / BLIP2_ACC)
            if start_step > n_windows:
                # stale RESUME / changed batch geometry: islice would
                # exhaust silently and the restored partial loss list
                # would be logged as the full epoch (ADVICE r4)
                raise SystemExit(
                    f"RESUME step {start_step} > {n_windows} optimizer "
                    f"windows in epoch {epoch} — stale RESUME dir or "
                    "changed --batch_size/dataset? Delete the RESUME "
                    "directory to start the epoch over.")
            skip, losses = start_step, list(resume_losses)
            import itertools
            stream = itertools.islice(stream, skip, None)
        for w, stacked in enumerate(stream):
            rng, srng = jax.random.split(rng)
            lora, opt_state, loss = step(lora, opt_state, stacked, srng)
            losses.append(float(loss))
            done = skip + w + 1
            if args.resume_every_steps and primary \
                    and done % args.resume_every_steps == 0:
                save_train_state(out_root=".", model_name="blip2_lora",
                                 params=lora, state={},
                                 opt_state=opt_state, rng=rng, epoch=epoch,
                                 phase_name="train", scheduler=None,
                                 best=best, step=done, losses=losses)
        val_acc = evaluate(lora, val_b, val_m)
        logger.log({"epoch": epoch, "avg_loss": float(np.mean(losses)),
                    "val_acc": val_acc,
                    "epoch_time_seconds": time.time() - t0})
        if primary:
            print(f"epoch {epoch}: loss={np.mean(losses):.4f} "
                  f"val_acc={val_acc:.2f}")
        if val_acc > best.best_val_acc:
            # every process tracks the same best (val_acc is identical —
            # vlm_eval_multiprocess), but only the primary writes
            if n_pipe > 1:
                # portable per-layer form: blip2_test / serve load BEST
                # adapters on the dp/tp paths regardless of the train mesh
                from ..parallel import pp as ppp
                best_lora = ppp.unstack_pipeline_lora(jax.device_get(lora))
            else:
                best_lora = lora
            best = PhaseResult(val_acc, epoch, save_best(
                {"lora": best_lora}, {}, model_name="blip2_lora",
                epoch=epoch, val_acc=val_acc, args=args,
                fine_tuning=False) if primary else best.best_path)
        if primary:
            save_train_state(out_root=".", model_name="blip2_lora",
                             params=lora, state={}, opt_state=opt_state,
                             rng=rng, epoch=epoch, phase_name="train",
                             scheduler=None, best=best)
    train_b.close()
    val_b.close()
    if primary:
        print(f"best val acc {best.best_val_acc:.2f} "
              f"@ epoch {best.best_epoch}")
    return best


if __name__ == "__main__":
    main()
