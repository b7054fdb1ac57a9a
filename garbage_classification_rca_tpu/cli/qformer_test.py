"""Q-Former classifier test CLI.

Parity with reference q_former_test_set.py:229-278: rebuild BLIP-2 + the
Linear(768, 4) head, load backbone (--model_path) and classifier
(--classifier_weights, options.py:112-113), evaluate the test folder.
Defect fixed knowingly: accuracy divides by the real dataset size, not the
hard-coded 2000 (q_former_test_set.py:171).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from ..config import args_parser, jnp_compute_dtype
from ..data.manifest import build_manifest
from ..eval.report import generate_report_and_image
from ..models.vlm import blip2
from ..train.engine import load_orbax
from .blip2_common import Blip2Batcher, build_blip2, place_blip2_params
from .qformer_train import make_steps

BASE_PATH = "./test_set_reports"


def main(argv=None):
    args = args_parser(argv)
    cfg, params, _, tok = build_blip2(args, with_lora=False)
    if args.classifier_weights and os.path.isdir(args.classifier_weights):
        trainable, _ = load_orbax(args.classifier_weights)
    elif args.classifier_weights and os.path.isfile(args.classifier_weights):
        # reference two-file layout: the classifier is its own torch .pth
        # (MultimodalClassifier = Linear(768,4) saved via state_dict(),
        # q_former_training.py:33-47; loaded q_former_test_set.py:270)
        import jax.numpy as jnp
        from ..checkpoint.torch_convert import load_torch_state_dict
        csd = load_torch_state_dict(args.classifier_weights)
        from .. import NUM_CLASSES
        # the reference saves MultimodalClassifier.state_dict() whose single
        # Linear is the attribute `classifier` (q_former_training.py:24-31);
        # a bare Linear.state_dict() would carry 'weight'/'bias' instead
        if "classifier.weight" not in csd or "classifier.bias" not in csd:
            raise SystemExit(
                f"--classifier_weights {args.classifier_weights} does not "
                "look like a MultimodalClassifier state_dict (expected keys "
                "'classifier.weight'/'classifier.bias', found "
                f"{sorted(csd)[:8]}) — was it saved via "
                "q_former_training.py:33-47?")
        if tuple(csd["classifier.weight"].shape) != (NUM_CLASSES,
                                                     cfg.qformer.hidden):
            raise SystemExit(
                f"--classifier_weights expects Linear({cfg.qformer.hidden}"
                f", {NUM_CLASSES}) but {args.classifier_weights} has weight "
                f"shape {tuple(csd['classifier.weight'].shape)} — trained "
                "against a different Q-Former width or class count?")
        trainable = {"classifier": {
            "w": jnp.asarray(csd["classifier.weight"]).T,
            "b": jnp.asarray(csd["classifier.bias"])}}
    else:
        trainable = {"classifier": blip2.init_classifier(
            jax.random.PRNGKey(args.seed + 2), cfg)}

    from ..parallel.mesh import clamp_eval_batch, make_mesh, shard_params
    from .blip2_common import vlm_multihost_mesh_check
    mesh = make_mesh(args.mesh_shape)
    vlm_multihost_mesh_check(mesh)   # pipe meshes are single-process only
    params = place_blip2_params(mesh, params)
    trainable = shard_params(mesh, trainable)

    m = build_manifest(args.dataset_folder_name)
    print(f"Num of test images: {len(m)}")
    b = Blip2Batcher(m, tok, workers=args.data_workers)
    import jax.numpy as jnp
    _, _, eval_step = make_steps(
        cfg, params, mesh=mesh,
        compute_dtype=jnp_compute_dtype(args.compute_dtype))

    bs = clamp_eval_batch(args.eval_batch_size or 16, len(m), mesh)
    from .blip2_common import vlm_eval
    acc, labels, preds = vlm_eval(eval_step, trainable, b, bs, mesh,
                                  len(m),
                                  prefetch_depth=args.prefetch_depth)
    b.close()
    if jax.process_index() == 0:   # one report writer on multi-host runs
        report = generate_report_and_image(
            labels, preds, acc, os.path.join(BASE_PATH, "qformer"),
            "qformer", kind="qformer")
        print(f"Test accuracy: {acc:.2f} %")
        print(report)
    return acc


if __name__ == "__main__":
    main()
