"""Image-model test-set evaluation CLI.

Parity with reference calculate_test_accuracy_image.py:136-264:
``python -m garbage_classification_rca_tpu.cli.test_image
  --image_model=<arch> --model_path=<ckpt.pth>
  --dataset_folder_name=<test-root>``
loads the checkpoint (reference .pth or our orbax dir), evaluates the test
folder, prints accuracy + report, and writes the confusion-matrix PNG +
report CSV under ``test_set_reports/<arch>/``.

TPU-native differences: batch is sharded over the device mesh, the forward
runs in bf16 under one jitted step with normalization fused, and batches
are larger than the reference's V100 envelopes (per-arch table in
config.IMAGE_ARCHS, overridable via --eval_batch_size).
"""

from __future__ import annotations

import os
import sys

import jax.numpy as jnp
import numpy as np

from .. import NUM_CLASSES
from ..config import args_parser, jnp_compute_dtype, IMAGE_ARCHS
from ..checkpoint.torch_convert import load_torch_state_dict
from ..data.manifest import build_manifest
from ..data.pipeline import ImageTextBatcher
from ..eval.harness import run_image_eval
from ..eval.report import generate_report_and_image
from ..models import get_image_model
from ..parallel.mesh import make_mesh, shard_params

BASE_PATH = "./test_set_reports"


def main(argv=None):
    args = args_parser(argv)
    if args.model_path == "":
        print("Please provide test model path")
        sys.exit(0)   # exit code 0 is reference-faithful
        # (calculate_test_accuracy_image.py:138-140 sys.exit(0))

    from . import resolve_model
    mdef = resolve_model(get_image_model, args.image_model)
    spec = IMAGE_ARCHS[args.image_model]
    batch_size = args.eval_batch_size or spec.eval_batch

    print(f"Image Model: {args.image_model}")
    if os.path.isdir(args.model_path):
        # our own training output (orbax dir, train/engine.save_best)
        import jax as _jax

        from ..train.engine import check_loaded_tree, load_orbax
        params, state = load_orbax(args.model_path)
        check_loaded_tree(
            params,
            lambda: mdef.init(_jax.random.PRNGKey(0), num_classes=NUM_CLASSES),
            f"--image_model={args.image_model}")
    else:
        if mdef.convert_torch is None:
            print(f"No torch converter registered for {args.image_model}")
            sys.exit(1)
        from ..checkpoint.torch_convert import convert_checked
        sd = load_torch_state_dict(args.model_path)
        params, state = convert_checked(
            mdef.convert_torch, sd, f"--image_model={args.image_model}",
            num_classes=NUM_CLASSES)

    if "bn_eps" in mdef.extras:
        # inference-time conv+BN folding: numerically identical to eval-mode
        # BN, -21% forward time measured on v5e (nn/fold.py)
        from ..nn.fold import fold_batchnorm
        params, state = fold_batchnorm(params, state, mdef.extras["bn_eps"])

    from ..utils.dtype import cast_float_params, resolve_param_dtype
    params = cast_float_params(params,
                               resolve_param_dtype(args, args.compute_dtype))

    mesh = make_mesh(args.mesh_shape)
    params = shard_params(mesh, params)
    state = shard_params(mesh, state)

    manifest = build_manifest(args.dataset_folder_name)
    print(f"Num of test images: {len(manifest)}")

    from ..parallel.mesh import clamp_eval_batch
    batch_size = clamp_eval_batch(batch_size, len(manifest), mesh)
    batcher = ImageTextBatcher(manifest, spec.input_size,
                               workers=args.data_workers)

    dtype = jnp_compute_dtype(args.compute_dtype)
    if args.profile_dir:
        from ..utils.profiling import trace
        with trace(args.profile_dir):
            acc, labels, preds, stats = run_image_eval(
                mdef.apply, params, state, batcher, batch_size, mesh, dtype,
                prefetch_depth=args.prefetch_depth)
    else:
        acc, labels, preds, stats = run_image_eval(
            mdef.apply, params, state, batcher, batch_size, mesh, dtype,
            prefetch_depth=args.prefetch_depth)
    batcher.close()

    print(f"\nsamples checked for test: {stats['n']}")
    print(f"eval throughput: {stats['samples_per_s']:.1f} samples/s "
          f"(p50 step {stats['p50_step_s'] * 1e3:.1f} ms)")
    import jax as _jax

    if _jax.process_index() == 0:   # one report writer on multi-host runs
        report = generate_report_and_image(
            labels, preds, acc, os.path.join(BASE_PATH, args.image_model),
            args.image_model, kind="image")
        print(manifest.class_to_idx)
        print(f"Test accuracy: {acc:.2f} %")
        print("Test Report:")
        print(report)
    return acc


if __name__ == "__main__":
    main()
