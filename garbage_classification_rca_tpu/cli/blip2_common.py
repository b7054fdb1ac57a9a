"""Shared plumbing for the BLIP-2 / Q-Former CLIs.

Builds the model from either the full HF checkpoint (.pth/.bin via
--model_path pointing at a state-dict file) or random init (hermetic runs),
prepares the prompt/label token batches (blip_2_training.py:47-107 parity:
left-padded 100-token prompts, label = answer word tokens), and provides
the jitted eval steps.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RunConfig
from ..data.images import blip_preprocess_image, CLIP_MEAN, CLIP_STD
from ..data.manifest import Manifest
from ..data.tokenizer import BaseTokenizer, get_tokenizer, resolve_vocab_dir
from ..models.vlm import blip2
from ..models.vlm.prompts import (FOLDER_TO_ANSWER, MAX_PROMPT_TOKENS,
                                  build_prompt, prompt_text_from_path)


def normalize_clip(x_uint8, dtype=jnp.bfloat16):
    scale = (1.0 / (255.0 * CLIP_STD)).astype(np.float32)
    shift = (-CLIP_MEAN / CLIP_STD).astype(np.float32)
    y = x_uint8.astype(jnp.float32) * jnp.asarray(scale) + jnp.asarray(shift)
    return y.astype(dtype)


def left_pad(ids: List[int], max_len: int, pad_id: int) -> Tuple[List[int], List[int]]:
    """BLIP-2 prompts are LEFT-padded to 100 (blip_2_training.py:66)."""
    ids = ids[-max_len:]
    pad = max_len - len(ids)
    return [pad_id] * pad + ids, [0] * pad + [1] * len(ids)


def place_blip2_params(mesh, params):
    """Place the (frozen) BLIP-2 params on the mesh: Megatron-TP-shard
    the OPT tower when the mesh has a 'model' axis of size > 1
    (parallel/tp.py specs — q/k/v/fc1 column-, out/fc2 row-sharded),
    replicate otherwise. Small trainable trees (LoRA, classifier,
    optimizer state) stay replicated at the call sites. Composes with
    int8-quantized trees (opt_param_specs shards w_scale with its
    weight's output dim)."""
    from ..parallel.mesh import MODEL_AXIS, shard_params

    if dict(mesh.shape).get(MODEL_AXIS, 1) > 1:
        from ..parallel.tp import blip2_param_specs, shard_with_specs

        return shard_with_specs(mesh, params, blip2_param_specs(params))
    return shard_params(mesh, params)


def setup_pipeline(cfg, params, lora, mesh):
    """Stage-shard the OPT decoder over the mesh's 'pipe' axis for the
    GPipe train/eval/generate paths (parallel/pp.py).

    Returns (params, stage_layers, stage_lora): params with its
    ``opt.layers`` list emptied (the replicated decoder copy is dropped —
    that memory saving is the point of pipelining) and the remaining
    towers placed via place_blip2_params; per-layer adapters come back
    stage-stacked (pass lora=None for base weights only). Guards the
    unsupported model+pipe combination and non-dividing layer counts with
    clean exits — shared by blip2_train and blip2_test so the mesh
    contract cannot drift between them."""
    from ..parallel import pp as ppp

    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_pipe = sizes.get("pipe", 1)
    if sizes.get("model", 1) > 1:
        raise SystemExit("--mesh_shape: combine pipe with data only "
                         "(model-axis TP of a stage-sharded decoder "
                         "is not supported)")
    if cfg.opt.layers % n_pipe:
        raise SystemExit(f"--mesh_shape pipe:{n_pipe} must divide the "
                         f"{cfg.opt.layers}-layer OPT decoder")
    stage_layers = ppp.shard_pipeline_params(
        mesh, ppp.stack_pipeline_params(params["opt"]["layers"], n_pipe))
    params = {**params, "opt": {**params["opt"], "layers": []}}
    params = place_blip2_params(mesh, params)
    stage_lora = None
    if lora is not None:
        stage_lora = ppp.shard_pipeline_params(
            mesh, ppp.stack_pipeline_lora(lora, cfg.opt.layers, n_pipe))
    return params, stage_layers, stage_lora


class Blip2Batcher:
    """Host batches: CLIP-preprocessed uint8 images + left-padded prompt
    tokens + answer-word label tokens + class labels."""

    def __init__(self, manifest: Manifest, tokenizer: BaseTokenizer,
                 workers: int = 8, label_token_len: int = 4):
        import concurrent.futures as cf

        self.m = manifest
        self.tok = tokenizer
        self.label_token_len = label_token_len
        self.pool = cf.ThreadPoolExecutor(max_workers=workers)
        # one label-token sequence per class (fixed, computed once)
        self.answer_token_ids = {}
        for folder, word in FOLDER_TO_ANSWER.items():
            ids, _ = self.tok.encode_one(word, label_token_len)
            self.answer_token_ids[folder] = ids

    def close(self):
        self.pool.shutdown(wait=False)

    def make_batch(self, indices, batch_size) -> Dict[str, np.ndarray]:
        n = len(indices)
        padded = np.concatenate([indices, np.zeros(batch_size - n, np.int64)]) \
            if n < batch_size else indices
        samples = [self.m.samples[i] for i in padded]
        imgs = list(self.pool.map(
            lambda s: blip_preprocess_image(s.image_path), samples))
        ids_rows, mask_rows, lab_rows = [], [], []
        pad_id = self.tok.pad_id
        for s in samples:
            prompt = build_prompt(prompt_text_from_path(s.image_path))
            pids, _ = self.tok.encode_one(prompt, MAX_PROMPT_TOKENS)
            ids, mask = left_pad(pids, MAX_PROMPT_TOKENS, pad_id)
            folder = self.m.classes[s.label]
            lab = self.answer_token_ids[folder][:self.label_token_len]
            lab = lab + [pad_id] * (self.label_token_len - len(lab))
            ids_rows.append(ids)
            mask_rows.append(mask)
            lab_rows.append(lab)
        return {
            "image": np.stack(imgs).astype(np.uint8),
            "input_ids": np.asarray(ids_rows, np.int32),
            "attention_mask": np.asarray(mask_rows, np.int32),
            "label_tokens": np.asarray(lab_rows, np.int32),
            "label": np.asarray([s.label for s in samples], np.int32),
            "valid": np.asarray([1] * n + [0] * (batch_size - n), np.int32),
        }

    def iter_batches(self, batch_size: int, *, shuffle=False, seed=0):
        from ..data.pipeline import batch_indices

        for plan in batch_indices(len(self.m), batch_size, shuffle=shuffle,
                                  seed=seed):
            yield self.make_batch(plan, batch_size)


def tiny_blip2_config() -> blip2.Blip2Config:
    """Reduced geometry for hermetic tests / CPU drives
    (GC_RCA_TINY_BLIP2=1). Same code paths, ~1000x fewer FLOPs."""
    from ..models.vlm import blip2_vision, opt as opt_mod, qformer as qf

    return blip2.Blip2Config(
        vision=blip2_vision.VisionConfig(layers=2, hidden=64, heads=4,
                                         ffn=128, patch=14, image_size=224),
        qformer=qf.QFormerConfig(layers=2, hidden=32, heads=4, ffn=64,
                                 n_query=8, cross_frequency=2,
                                 vision_hidden=64),
        opt=opt_mod.OPTConfig(layers=2, hidden=64, heads=4, ffn=128,
                              vocab=50272, max_pos=256),
        lora_r=4, lora_alpha=8)


def build_blip2(args: RunConfig, with_lora: bool = True):
    """-> (cfg, params, lora, tokenizer). Loads --model_path when given
    (HF/peft state dict), else random-init (hermetic)."""
    if os.environ.get("GC_RCA_TINY_BLIP2"):
        cfg = tiny_blip2_config()
    else:
        cfg = blip2.Blip2Config()
    tok = get_tokenizer("opt", vocab_dir=resolve_vocab_dir(args))
    if args.model_path and os.path.isfile(args.model_path):
        from ..checkpoint.torch_convert import load_torch_state_dict
        params, lora = blip2.convert_torch(load_torch_state_dict(
            args.model_path), cfg)
    else:
        params = blip2.init(jax.random.PRNGKey(args.seed), cfg,
                            dtype=jnp.bfloat16)
        lora = None
    if with_lora and lora is None:
        lora = blip2.init_lora(jax.random.PRNGKey(args.seed + 1), cfg)
    return cfg, params, lora, tok


def class_logits_from_next_token(next_logits: jnp.ndarray,
                                 answer_first_tokens: np.ndarray) -> jnp.ndarray:
    """Constrained 1-token decode: score only each answer word's first
    token (greedy argmax over the 4 bins — equivalent to the reference's
    generate + find_closest_string when the decoded token is one of the
    answers' first tokens)."""
    return next_logits[:, answer_first_tokens]


# every key a Blip2Batcher batch carries — the sharding dicts for the
# train/eval jits are built from this one list so the two trainer CLIs
# cannot drift
BATCH_KEYS = ("image", "input_ids", "attention_mask", "label_tokens",
              "label", "valid")


def make_accum_step(grad_fn, opt, acc_steps: int, mesh=None,
                    inherit_trainable: bool = False,
                    with_rng: bool = False):
    """The grad-accumulating optimizer step shared by the BLIP-2 LoRA and
    Q-Former classifier trainers (they differ only in the loss).

    grad_fn: ``jax.value_and_grad`` of loss(trainable, frozen, microbatch).
    Returns a jitted ``(frozen, trainable, opt_state, stacked_batch) ->
    (trainable, opt_state, mean_loss)`` where stacked_batch has a leading
    microbatch dim of W <= acc_steps.

    ``with_rng=True``: grad_fn is loss(trainable, frozen, mb, rng) and the
    returned step takes a trailing rng argument; each microbatch gets
    fold_in(rng, i) (--hf_internal_dropout threads its dropout keys this
    way).

    Reference semantics (blip_2_training.py:274-293,
    q_former_training.py:294-301): the optimizer steps every ``acc_steps``
    DataLoader batches with loss/acc_steps backwards per microbatch — so a
    trailing PARTIAL window still divides by the configured acc_steps, not
    the window length. The frozen backbone enters as a jit ARGUMENT:
    closing over it would bake GBs of weights into the executable as
    captured constants. With a mesh, the microbatch axis stays replicated
    and the batch axis is sharded over 'data' (XLA psums the grads).
    """
    import optax

    def _fn(frozen, trainable, opt_state, batch, rng=None):
        acc = jax.tree_util.tree_leaves(batch)[0].shape[0]

        def micro(carry, xs):
            mb, i = xs
            grads_acc, loss_acc = carry
            if with_rng:
                loss, grads = grad_fn(trainable, frozen, mb,
                                      jax.random.fold_in(rng, i))
            else:
                loss, grads = grad_fn(trainable, frozen, mb)
            grads_acc = jax.tree_util.tree_map(
                lambda a, g: a + g.astype(jnp.float32), grads_acc, grads)
            return (grads_acc, loss_acc + loss), None

        zero = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), trainable)
        (grads, loss_sum), _ = jax.lax.scan(
            micro, (zero, 0.0), (batch, jnp.arange(acc)))
        grads = jax.tree_util.tree_map(lambda g: g / acc_steps, grads)
        updates, opt_state = opt.update(grads, opt_state, trainable)
        return (optax.apply_updates(trainable, updates), opt_state,
                loss_sum / acc)

    if mesh is None:
        return jax.jit(_fn)
    from ..parallel.mesh import replicated_sharding
    from ..train.loop import microbatch_sharding
    rs, mbs = replicated_sharding(mesh), microbatch_sharding(mesh)
    shard = {k: mbs for k in BATCH_KEYS}
    # frozen's in_sharding is None: inherit the arg's committed placement
    # (replicated OR Megatron-TP via place_blip2_params) instead of
    # forcing replication, which rejects TP-sharded towers.
    # inherit_trainable=True does the same for trainable+opt_state — the
    # GPipe path commits stage-stacked adapters sharded over 'pipe'
    rs_t = None if inherit_trainable else rs
    in_sh = (None, rs_t, rs_t, shard) + ((rs,) if with_rng else ())
    return jax.jit(_fn, in_shardings=in_sh,
                   out_shardings=(rs_t, rs_t, rs))


def iter_accum_windows(batcher, batch_size: int, acc_steps: int, *,
                       shuffle: bool = False, seed: int = 0):
    """Yield stacked [W, ...] microbatch windows (W == acc_steps, plus one
    trailing partial window) — the host side of make_accum_step, shared by
    both trainer epoch loops."""
    stack = []
    for batch in batcher.iter_batches(batch_size, shuffle=shuffle,
                                      seed=seed):
        stack.append(batch)
        if len(stack) == acc_steps:
            yield {k: np.stack([b[k] for b in stack]) for k in stack[0]}
            stack = []
    if stack:
        yield {k: np.stack([b[k] for b in stack]) for k in stack[0]}


def vlm_train_stream(batcher, batch_size: int, acc_steps: int, mesh, *,
                     seed: int, prefetch_depth: int = 2):
    """The trainer input stream, multi-host aware: single-process it is
    iter_accum_windows (trailing PARTIAL window, reference /acc_steps
    semantics); under multi-process it is multihost.stacked_train_stream
    with the same global shuffle plan — each host decodes only its rows,
    and the trailing window is PADDED to acc_steps with valid=0
    microbatches instead of shortened. Gradients are identical either way
    (a fully-masked microbatch contributes zero loss and zero grads —
    shifted_ce and train/loss.py both guard the 0-denominator); only the
    trailing window's LOGGED mean loss divides by acc_steps instead of W.
    """
    import jax

    if jax.process_count() > 1:
        from ..parallel.multihost import stacked_train_stream

        return stacked_train_stream(batcher, batch_size, acc_steps, mesh,
                                    seed=seed, keys=BATCH_KEYS,
                                    prefetch_depth=prefetch_depth)
    from ..data.pipeline import lookahead

    # single-process: same --prefetch_depth pull-ahead (host decode/stack
    # of the next window overlaps the in-flight accum step; ADVICE r3
    # flagged the flag as silently inert on exactly this branch)
    return lookahead(iter_accum_windows(batcher, batch_size, acc_steps,
                                        shuffle=True, seed=seed),
                     prefetch_depth)


def vlm_eval_multiprocess(eval_step, trainable, batcher, batch_size: int,
                          mesh, prefetch_depth: int = 2):
    """Multi-host twin of the VLM eval loops: adapts the CLIs'
    ``eval_step(trainable, batch)`` contract to
    multihost.run_eval_multiprocess (each host decodes only its rows;
    acc/labels/preds identical to the single-process stream on every
    host). Batches keep ALL BATCH_KEYS — the jitted steps' in_shardings
    dicts are built from that list and must see the same structure."""
    from ..parallel.multihost import run_eval_multiprocess

    def step(t, _state, batch):
        return eval_step(t, batch)

    return run_eval_multiprocess(step, trainable, None, batcher,
                                 batch_size, mesh, keys=BATCH_KEYS,
                                 prefetch_depth=prefetch_depth)


def vlm_eval(eval_step, trainable, batcher, batch_size: int, mesh,
             n_total: int, prefetch_depth: int = 2):
    """THE VLM eval loop — the test CLIs and the trainers' per-epoch
    evaluate all go through here so the valid-mask bookkeeping and the
    acc denominator (actual dataset size, not the reference's hard-coded
    2000 — blip_2_test_set.py:162) cannot drift between call sites.
    Dispatches to run_eval_multiprocess under multi-process JAX;
    tests/test_multihost.py proves both branches agree at one process.
    Returns (acc, labels, preds) with padding rows masked out."""
    if jax.process_count() > 1:
        acc, labels, preds, _ = vlm_eval_multiprocess(
            eval_step, trainable, batcher, batch_size, mesh,
            prefetch_depth=prefetch_depth)
        return acc, labels, preds
    from ..data.pipeline import lookahead

    correct, all_p, all_l = 0, [], []
    # --prefetch_depth on the single-process branch too: decode of the
    # next batch overlaps the in-flight eval step (ADVICE r3)
    for batch in lookahead(batcher.iter_batches(batch_size),
                           prefetch_depth):
        preds, c = eval_step(trainable, batch)
        correct += int(c)
        valid = np.asarray(batch["valid"]).astype(bool)
        all_p.append(np.asarray(preds)[valid])
        all_l.append(np.asarray(batch["label"])[valid])
    acc = 100.0 * correct / n_total
    return acc, np.concatenate(all_l), np.concatenate(all_p)


def vlm_multihost_mesh_check(mesh):
    """Multi-process VLM runs support data (and model-axis TP) meshes;
    pipe meshes stay single-process (the GPipe ring's ppermute schedule
    is validated on single-process meshes only)."""
    import jax

    if jax.process_count() > 1 and \
            dict(zip(mesh.axis_names, mesh.devices.shape)).get("pipe", 1) > 1:
        raise SystemExit(
            "--mesh_shape with a pipe axis is single-process only; "
            "multi-host (GC_RCA_MULTIHOST) VLM runs support data / "
            "data,model meshes")
