"""BLIP-2 test-set evaluation CLI.

Parity with reference blip_2_test_set.py:222-266: rebuild BLIP-2 + LoRA,
load the checkpoint (dict or {'model_state_dict': ...} wrapper,
blip_2_test_set.py:253-259), run 1-token constrained decode over the test
folder, emit confusion PNG + report CSV.

Defect fixed knowingly: the reference divides accuracy by a HARD-CODED
``len_test_set = 2000`` (blip_2_test_set.py:162,190); we divide by the
actual dataset size (SURVEY §2 defects list).

Scaling: ``--mesh_shape=data:D`` dp-shards batches,
``--mesh_shape=data:1,model:M`` Megatron-TP-shards the OPT tower, and
``--mesh_shape=data:D,pipe:S`` evals through a GPipe-stage-sharded
decoder (1-token path via make_pp_eval_step, --max_new_tokens>1 via
parallel.pp.pp_generate with stage-stacked adapters) — reports equal
the dp run's.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from ..config import args_parser, jnp_compute_dtype
from ..data.manifest import build_manifest
from ..eval.report import generate_report_and_image
from ..train.engine import load_orbax
from .blip2_common import Blip2Batcher, build_blip2, place_blip2_params
from .blip2_train import answer_first_token_table, make_eval_step

BASE_PATH = "./test_set_reports"


def main(argv=None):
    args = args_parser(argv)
    if jax.process_count() > 1 and args.max_new_tokens > 1:
        # the generate paths drive their own batch loops (KV caches, host
        # token decode) — multi-host input sharding covers the 1-token
        # constrained-decode path only
        raise SystemExit(
            "--max_new_tokens>1 is single-process only; multi-host "
            "(GC_RCA_MULTIHOST) BLIP-2 eval supports the 1-token "
            "constrained-decode path")
    cfg, params, lora, tok = build_blip2(args)
    if args.model_path and os.path.isdir(args.model_path):
        restored, _ = load_orbax(args.model_path)
        lora = restored["lora"]

    from ..parallel.mesh import clamp_eval_batch, make_mesh, shard_params
    from .blip2_common import vlm_multihost_mesh_check
    mesh = make_mesh(args.mesh_shape)
    vlm_multihost_mesh_check(mesh)   # pipe meshes are single-process only
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_pipe = sizes.get("pipe", 1)
    stage_layers = stage_lora = None
    if n_pipe > 1:
        # GPipe eval: decoder stage-sharded, adapters stage-stacked —
        # a pipe-trained model evals through the mesh it trained on
        # (1-token path via make_pp_eval_step, multi-token via
        # pp_generate); predictions equal the dp run's
        from .blip2_common import setup_pipeline
        params, stage_layers, stage_lora = setup_pipeline(cfg, params,
                                                          lora, mesh)
    else:
        params = place_blip2_params(mesh, params)
        lora = shard_params(mesh, lora)

    import jax.numpy as jnp
    dtype = jnp_compute_dtype(args.compute_dtype)

    m = build_manifest(args.dataset_folder_name)
    print(f"Num of test images: {len(m)}")
    b = Blip2Batcher(m, tok, workers=args.data_workers)
    bs = clamp_eval_batch(args.eval_batch_size or 16, len(m), mesh)
    if n_pipe > 1:
        # pp_generate pins one microbatch per stage and dp-shards within
        # each, so pipe meshes need batch % (pipe * data) == 0; round the
        # eval batch up — tail padding is masked by `valid` either way
        pp_unit = n_pipe * sizes.get("data", 1)
        bs = max(pp_unit, ((bs + pp_unit - 1) // pp_unit) * pp_unit)
    if args.max_new_tokens <= 1:
        # reference path: 1-token constrained decode over the 4 answer words
        aft = answer_first_token_table(b, m.classes)
        if n_pipe > 1:
            from .blip2_train import make_pp_eval_step, pick_pp_microbatches
            pstep = make_pp_eval_step(
                cfg, params, stage_layers, aft, mesh,
                pick_pp_microbatches(bs, mesh), compute_dtype=dtype)

            def step(lora, batch):
                del lora                 # adapters live stage-stacked
                return pstep(stage_lora, batch)
        else:
            step = make_eval_step(cfg, params, aft, mesh=mesh,
                                  compute_dtype=dtype)
    else:
        # serving path: KV-cache greedy decode + the reference's
        # find_closest_string word mapping (blip_2_training.py:118-134) —
        # equivalent to the 1-token constrained path for trained models,
        # robust to multi-token/verbose answers
        from ..models.vlm import blip2 as blip2_mod
        from ..models.vlm.prompts import (ANSWER_TO_CLASS_IDX, ANSWER_WORDS,
                                          find_closest_string)
        from ..parallel.mesh import batch_sharding, replicated_sharding
        from .blip2_common import normalize_clip

        n_new = args.max_new_tokens
        if n_pipe > 1:
            # ring-scheduled pipelined decode (parallel/pp.pp_generate) —
            # greedy, fp weights; adapters ride stage-stacked
            if args.gen_temperature > 0:
                raise SystemExit("--gen_temperature: sampled decode is "
                                 "not supported on pipe meshes (use a "
                                 "data/model mesh)")
            if args.int8_weights:
                raise SystemExit("--int8_weights: weight-only int8 is "
                                 "not supported on pipe meshes (use a "
                                 "data/model mesh; --kv_cache_dtype=int8 "
                                 "works on both)")
            from ..parallel import pp as ppp
            cache_dtype = args.kv_cache_dtype or None
            bsh = batch_sharding(mesh)

            def _gen_fn(frozen, stages, slora, pix, ids, mask):
                embeds, full_mask = blip2_mod.prompt_embeds(
                    frozen, normalize_clip(pix, dtype), ids, mask, cfg)
                return ppp.pp_generate(frozen["opt"], stages, embeds,
                                       full_mask, cfg.opt, mesh, n_new,
                                       cache_dtype=cache_dtype,
                                       stage_lora=slora,
                                       lora_scale=cfg.lora_scale)

            pgen = jax.jit(_gen_fn,
                           in_shardings=(None, None, None, bsh, bsh, bsh),
                           out_shardings=(bsh, bsh))

            def gen(frozen, lora, pix, ids, mask, rng):
                del lora, rng            # greedy; adapters stage-stacked
                return pgen(frozen, stage_layers, stage_lora, pix, ids,
                            mask)

        elif args.int8_weights:
            # weight-only int8 on the decode-bound OPT tower (the vision/
            # Q-Former towers run once at prefill and stay fp); the LoRA
            # adapters stay fp and add on top of the int8 base projection
            from ..ops.quant import quantize_opt_weights
            params = dict(params, opt=quantize_opt_weights(params["opt"]))
            params = place_blip2_params(mesh, params)
        if n_pipe == 1:
            sampler = None
            if args.gen_temperature > 0:
                # opt-in sampled eval (HF do_sample semantics on-device);
                # default stays greedy = reference parity
                from ..ops.sampling import SamplerConfig
                sampler = SamplerConfig(temperature=args.gen_temperature,
                                        top_k=args.gen_top_k,
                                        top_p=args.gen_top_p)
            cache_dtype = args.kv_cache_dtype or None
            bsh, rsh = batch_sharding(mesh), replicated_sharding(mesh)
            gen = jax.jit(lambda frozen, lora, pix, ids, mask, rng:
                          blip2_mod.generate(frozen,
                                             normalize_clip(pix, dtype),
                                             ids, mask, cfg, lora=lora,
                                             max_new_tokens=n_new,
                                             sampler=sampler, rng=rng,
                                             cache_dtype=cache_dtype),
                          in_shardings=(None, rsh, bsh, bsh, bsh, rsh),  # frozen: as placed
                          out_shardings=(bsh, bsh))
        # The key is a jit ARGUMENT (not a captured constant) and is
        # split per batch below — a fixed key baked into the closure
        # would hand every batch the identical Gumbel noise sequence.
        base_rng = jax.random.PRNGKey(args.gen_seed)
        batch_idx = 0

        def step(lora, batch):  # same (preds, correct) contract
            nonlocal batch_idx
            rng = jax.random.fold_in(base_rng, batch_idx)
            batch_idx += 1
            toks, tvalid = gen(params, lora, batch["image"],
                               batch["input_ids"], batch["attention_mask"],
                               rng)
            toks, tvalid = np.asarray(toks), np.asarray(tvalid)
            preds = []
            for r in range(toks.shape[0]):
                text = tok.decode(toks[r][tvalid[r]])
                word = find_closest_string(text, ANSWER_WORDS)
                preds.append(ANSWER_TO_CLASS_IDX[word])
            preds = np.asarray(preds, np.int32)
            correct = int(((preds == np.asarray(batch["label"]))
                           * np.asarray(batch["valid"])).sum())
            return preds, correct

    from .blip2_common import vlm_eval
    acc, labels, preds = vlm_eval(step, lora, b, bs, mesh, len(m),
                                  prefetch_depth=args.prefetch_depth)
    b.close()
    if jax.process_index() == 0:   # one report writer on multi-host runs
        report = generate_report_and_image(
            labels, preds, acc, os.path.join(BASE_PATH, "blip2"), "blip2",
            kind="blip2")
        print(f"Test accuracy: {acc:.2f} %")
        print(report)
    return acc


if __name__ == "__main__":
    main()
