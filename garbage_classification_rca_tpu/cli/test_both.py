"""Multimodal test-set evaluation CLI — the BASELINE.json headline path.

Parity with reference calculate_test_accuracy_both.py:143-240:
``python -m garbage_classification_rca_tpu.cli.test_both
  --late_fusion=MM_RCA --reverse --text_model=distilbert
  --model_path=<ckpt.pth> --dataset_folder_name=<test-root>``
builds the fusion model, loads the reference checkpoint (all-heads state
dict), evaluates mode 'both' with eval=True, and writes the confusion
PNG + CSV under ``test_set_reports/<late_fusion>/``.

TPU-native: one jitted step runs normalize + both towers + fusion + argmax,
batch sharded over the mesh; images cross H2D as uint8; the MM-RCA block
optionally runs the fused Pallas kernel (--use_pallas_rca behind
compute_dtype flag not needed — enabled by default on TPU).
Fixed-seed shuffle is NOT applied (reference uses shuffle=True on the test
loader — harmless for metrics, bad for per-sample dumps; SURVEY §2 defects).
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp

from ..config import (args_parser, jnp_compute_dtype, MULTIMODAL_IMAGE_SIZE,
                      MULTIMODAL_EVAL_BATCH)
from ..checkpoint.torch_convert import load_torch_state_dict
from ..data.images import normalize_on_device
from ..data.manifest import build_manifest
from ..data.pipeline import ImageTextBatcher
from ..data.tokenizer import get_tokenizer, resolve_vocab_dir, DEFAULT_SEQ_LEN
from ..eval.report import generate_report_and_image
from ..models.fusion import FusionConfig, build_fusion
from ..parallel.mesh import make_mesh, shard_params, batch_sharding, replicated_sharding

BASE_PATH = "./test_set_reports"


def fusion_config_from_args(args) -> FusionConfig:
    return FusionConfig(
        strategy=args.late_fusion,
        text_model_name=args.text_model,
        drop_ratio=args.model_dropout,
        image_or_text_dropout_chance=args.image_text_dropout,
        img_prob_dropout=args.image_prob_dropout,
        num_neurons_fc=args.num_neurons_FC,
        batch_size=args.batch_size,
        reverse=args.reverse,
        features_only=args.features_only,
        cross_attention_only=args.cross_attention_only,
        use_pallas_rca=(jax.default_backend() == "tpu"
                        and args.late_fusion == "MM_RCA"),
        hf_internal_dropout=getattr(args, "hf_internal_dropout", False),
    )


def make_both_eval_step(apply_fn, mesh, compute_dtype):
    def step(params, state, batch):
        x = normalize_on_device(batch["image"], dtype=compute_dtype)
        logits, _ = apply_fn(params, state,
                             (batch["input_ids"], batch["attention_mask"], x),
                             train=False, eval_mode=True)
        preds = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)
        correct = jnp.sum((preds == batch["label"]) * batch["valid"])
        return preds, correct

    if mesh is None:
        return jax.jit(step)
    bs, rs = batch_sharding(mesh), replicated_sharding(mesh)
    shard = {"image": bs, "input_ids": bs, "attention_mask": bs,
             "label": bs, "valid": bs}
    return jax.jit(step, in_shardings=(rs, rs, shard), out_shardings=(bs, rs))


def run_multimodal_eval(apply_fn, params, state, batcher, batch_size, mesh,
                        compute_dtype=jnp.bfloat16, progress=True,
                        prefetch_depth=2):
    from ..eval.harness import run_eval

    step = make_both_eval_step(apply_fn, mesh, compute_dtype)
    return run_eval(step, params, state, batcher, batch_size, mesh,
                    keys=("image", "input_ids", "attention_mask", "label",
                          "valid"), progress=progress,
                    prefetch_depth=prefetch_depth)


def main(argv=None):
    args = args_parser(argv)
    if args.model_path == "":
        print("Please provide test model path")
        sys.exit(0)   # exit code 0 is reference-faithful
        # (calculate_test_accuracy_image.py:138-140 sys.exit(0))

    cfg = fusion_config_from_args(args)
    from ..config import LATE_FUSION_STRATEGIES
    if args.late_fusion not in LATE_FUSION_STRATEGIES:
        print("Wrong late fusion strategy: ", args.late_fusion)  # reference main_both.py:342
        raise SystemExit(1)
    # other ValueErrors (e.g. hierarchical needs a per-layer-hidden-states
    # text tower) propagate with their specific message — a blanket catch
    # here used to mislabel them as a wrong strategy
    init_fn, apply_fn, convert_fn = build_fusion(cfg)
    if os.path.isdir(args.model_path):
        import jax as _jax

        from ..train.engine import check_loaded_tree, load_orbax
        params, state = load_orbax(args.model_path)
        check_loaded_tree(
            params, lambda: init_fn(_jax.random.PRNGKey(0)),
            f"--late_fusion={args.late_fusion} --text_model={args.text_model}")
    else:
        sd = load_torch_state_dict(args.model_path)
        params, state = convert_fn(sd)

    from ..nn.fold import fold_batchnorm
    params["image"], state["image"] = fold_batchnorm(
        params["image"], state["image"], 1e-3)   # EffNetV2 bn eps

    from ..utils.dtype import cast_float_params, resolve_param_dtype
    params = cast_float_params(params,
                               resolve_param_dtype(args, args.compute_dtype))

    manifest = build_manifest(args.dataset_folder_name,
                              extended_desc=args.extended_desc_val)
    print(f"Num of test images: {len(manifest)}")
    tok = get_tokenizer(args.text_model, vocab_dir=resolve_vocab_dir(args))
    from ..parallel.mesh import clamp_eval_batch, mesh_for_batch
    if cfg.strategy == "clip":
        # the CLIP head's FC is sized [cfg.batch_size, n] (reference
        # multimodal_model.py:620-623 builds Linear(batch_size, ...)), so
        # eval MUST run at exactly that batch; the pipeline's full-batch
        # tail padding keeps the trans_conv pad hack from ever firing.
        batch_size = cfg.batch_size
        mesh = mesh_for_batch(args.mesh_shape, batch_size)
    else:
        mesh = make_mesh(args.mesh_shape)
        batch_size = clamp_eval_batch(
            args.eval_batch_size or MULTIMODAL_EVAL_BATCH,
            len(manifest), mesh)
    params = shard_params(mesh, params)
    state = shard_params(mesh, state)
    batcher = ImageTextBatcher(
        manifest, MULTIMODAL_IMAGE_SIZE, tokenizer=tok,
        seq_len=args.seq_len or DEFAULT_SEQ_LEN,
        extended_desc=args.extended_desc_val is not None,
        workers=args.data_workers)

    dtype = jnp_compute_dtype(args.compute_dtype)
    acc, labels, preds, stats = run_multimodal_eval(
        apply_fn, params, state, batcher, batch_size, mesh, dtype,
        prefetch_depth=args.prefetch_depth)
    batcher.close()

    tag = args.late_fusion
    print(f"\nsamples checked for test: {stats['n']}")
    print(f"eval throughput: {stats['samples_per_s']:.1f} samples/s")
    import jax as _jax

    if _jax.process_index() == 0:   # one report writer on multi-host runs
        report = generate_report_and_image(
            labels, preds, acc, os.path.join(BASE_PATH, tag), tag,
            kind="both")
        print(f"Test accuracy: {acc:.2f} %")
        print("Test Report:")
        print(report)
    return acc


if __name__ == "__main__":
    main()
