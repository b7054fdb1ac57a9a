"""Text-model test-set evaluation CLI.

Parity with reference calculate_test_accuracy_text.py:138-224:
``python -m ...cli.test_text --text_model=distilbert
  --model_path=<ckpt.pth> --dataset_folder_name=<test-root>``
Text comes from filename stems (or the --extended_desc_val captions CSV),
tokenized host-side; the encoder+head forward runs as one sharded jitted
step. Reports land under ``test_set_reports/<text_model>/``.

(The reference infers balance_weights from 'true'/'false' substrings of the
checkpoint path — irrelevant at eval time since the criterion is unused;
we drop that quirk.)
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp

from .. import NUM_CLASSES
from ..config import args_parser, TEXT_ARCHS
from ..checkpoint.torch_convert import load_torch_state_dict
from ..data.manifest import build_manifest
from ..data.pipeline import ImageTextBatcher
from ..data.tokenizer import get_tokenizer, resolve_vocab_dir, DEFAULT_SEQ_LEN
from ..eval.report import generate_report_and_image
from ..models import get_text_model
from ..parallel.mesh import (make_mesh, shard_params, batch_sharding,
                             replicated_sharding)

BASE_PATH = "./test_set_reports"


def make_text_eval_step(apply_fn, mesh, *, text_model: str = ""):
    """Jitted eval step. A mesh with a 'seq' axis (e.g. --mesh_shape
    data:2,seq:4) routes DistilBERT through the sequence-parallel
    encoder (parallel/sp.py — numerics-identical to apply at eval,
    tests/test_sp.py); other text towers differ in embedding layout and
    exit cleanly rather than silently ignoring the axis."""
    seq_n = (dict(zip(mesh.axis_names, mesh.devices.shape)).get("seq", 1)
             if mesh is not None else 1)
    if seq_n > 1:
        if text_model != "distilbert":
            print(f"--mesh_shape with a seq axis supports only "
                  f"distilbert (got {text_model}); see parallel/sp.py")
            raise SystemExit(1)
        from ..parallel.sp import distilbert_classify_sp

        def step_sp(params, state, batch):
            logits = distilbert_classify_sp(
                params, batch["input_ids"], batch["attention_mask"], mesh)
            preds = jnp.argmax(logits.astype(jnp.float32),
                               axis=-1).astype(jnp.int32)
            correct = jnp.sum((preds == batch["label"]) * batch["valid"])
            return preds, correct

        return jax.jit(step_sp)

    def step(params, state, batch):
        logits, _ = apply_fn(params, state,
                             (batch["input_ids"], batch["attention_mask"]),
                             train=False)
        preds = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)
        correct = jnp.sum((preds == batch["label"]) * batch["valid"])
        return preds, correct

    if mesh is None:
        return jax.jit(step)
    bs, rs = batch_sharding(mesh), replicated_sharding(mesh)
    shard = {"input_ids": bs, "attention_mask": bs, "label": bs, "valid": bs}
    return jax.jit(step, in_shardings=(rs, rs, shard), out_shardings=(bs, rs))


def main(argv=None):
    args = args_parser(argv)
    if args.model_path == "":
        print("Please provide test model path")
        sys.exit(0)   # exit code 0 is reference-faithful
        # (calculate_test_accuracy_image.py:138-140 sys.exit(0))

    from . import resolve_model
    mdef = resolve_model(get_text_model, args.text_model)
    if os.path.isdir(args.model_path):
        import jax as _jax

        from ..train.engine import check_loaded_tree, load_orbax
        params, state = load_orbax(args.model_path)
        check_loaded_tree(
            params,
            lambda: mdef.init(_jax.random.PRNGKey(0), num_classes=NUM_CLASSES),
            f"--text_model={args.text_model}")
    else:
        from ..checkpoint.torch_convert import convert_checked
        sd = load_torch_state_dict(args.model_path)
        params, state = convert_checked(
            mdef.convert_torch, sd, f"--text_model={args.text_model}",
            num_classes=NUM_CLASSES)

    from ..utils.dtype import cast_float_params, resolve_param_dtype
    params = cast_float_params(params,
                               resolve_param_dtype(args, args.compute_dtype))

    mesh = make_mesh(args.mesh_shape)
    params = shard_params(mesh, params)
    state = shard_params(mesh, state)

    manifest = build_manifest(args.dataset_folder_name,
                              extended_desc=args.extended_desc_val)
    print(f"Num of test samples: {len(manifest)}")
    tok = get_tokenizer(args.text_model, vocab_dir=resolve_vocab_dir(args))
    from ..parallel.mesh import clamp_eval_batch
    batch_size = clamp_eval_batch(
        args.eval_batch_size or TEXT_ARCHS[args.text_model].eval_batch,
        len(manifest), mesh)
    batcher = ImageTextBatcher(
        manifest, (0, 0), tokenizer=tok, seq_len=args.seq_len or DEFAULT_SEQ_LEN,
        extended_desc=args.extended_desc_val is not None,
        workers=args.data_workers, with_images=False)

    from ..eval.harness import run_eval

    step = make_text_eval_step(mdef.apply, mesh, text_model=args.text_model)
    acc, labels, preds, stats = run_eval(
        step, params, state, batcher, batch_size, mesh,
        keys=("input_ids", "attention_mask", "label", "valid"),
        prefetch_depth=args.prefetch_depth)
    print(f"\nsamples checked for test: {stats['n']}")
    print(f"eval throughput: {stats['samples_per_s']:.1f} samples/s")
    if jax.process_index() == 0:
        report = generate_report_and_image(
            labels, preds, acc, os.path.join(BASE_PATH, args.text_model),
            args.text_model, kind="text")
        print(f"Test accuracy: {acc:.2f} %")
        print("Test Report:")
        print(report)
    return acc


if __name__ == "__main__":
    main()
