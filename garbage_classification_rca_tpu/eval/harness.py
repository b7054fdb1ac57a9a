"""Sharded, jit-compiled evaluation engine.

The reference eval loop (calculate_test_accuracy_image.py:60-119) moves a
batch to the GPU, runs the forward, argmaxes, and accumulates on host.
TPU-native version:

  * ONE jitted step: uint8 batch -> normalize (fused into the first conv by
    XLA) -> forward in bf16 -> argmax + masked correct-count. No fp32 image
    tensors ever cross HBM.
  * batch sharded over mesh axis 'data' (all chips advance together);
    predictions come back fully-addressable for host-side report math.
  * fixed-shape tail padding with a `valid` mask instead of ragged batches
    (keeps a single compiled executable).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.images import normalize_on_device
from ..data.pipeline import ImageTextBatcher, device_prefetch
from ..parallel.mesh import batch_sharding, replicated_sharding


def make_eval_step(apply_fn: Callable, mesh=None, compute_dtype=jnp.bfloat16,
                   norm_stats=None):
    """Build the jitted eval step for an image model.

    apply_fn(params, state, images_normalized) -> (logits, state)
    norm_stats: optional (mean, std) override — the reference's
    --calculate_dataset_stats path (main_image.py:427-431); defaults to
    ImageNet stats.
    """
    mean, std = norm_stats if norm_stats is not None else (None, None)

    def step(params, state, batch):
        x = normalize_on_device(batch["image"], mean=mean, std=std,
                                dtype=compute_dtype)
        logits, _ = apply_fn(params, state, x, train=False, rng=None)
        preds = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)
        correct = jnp.sum((preds == batch["label"]) * batch["valid"])
        return preds, correct

    if mesh is None:
        return jax.jit(step)
    bs = batch_sharding(mesh)
    rs = replicated_sharding(mesh)
    # params/state shardings stay UNSPECIFIED (None): the caller's
    # placement decides — replicated dp or --fsdp-sharded storage
    # (parallel/fsdp.py; GSPMD all-gathers sharded weights on use).
    # Only the batch layout is pinned.
    return jax.jit(
        step,
        in_shardings=(None, None, {"image": bs, "label": bs, "valid": bs}),
        out_shardings=(bs, rs),
    )


def run_eval(step, params, state, batcher: ImageTextBatcher,
             batch_size: int, mesh=None,
             keys: Tuple[str, ...] = ("image", "label", "valid"),
             progress: bool = True, prefetch_depth: int = 2
             ) -> Tuple[float, np.ndarray, np.ndarray, Dict]:
    """Generic full-dataset eval driver shared by the image/text/both test
    CLIs (reference loops calculate_test_accuracy_image.py:60-119 and the
    text/both variants). Takes a prebuilt jitted
    ``step(params, state, batch) -> (preds, correct)`` plus the batch keys
    it consumes; returns (acc%, labels, preds, timing stats).

    Dispatches to the multi-process twin under multi-host — outputs
    (acc/labels/preds) are identical to the single-process stream
    (parallel/multihost.py).
    """
    if mesh is not None and jax.process_count() > 1:
        from ..parallel.multihost import run_eval_multiprocess

        return run_eval_multiprocess(step, params, state, batcher,
                                     batch_size, mesh, keys=keys,
                                     progress=progress,
                                     prefetch_depth=prefetch_depth)
    n_total = len(batcher.m)
    all_preds, all_labels = [], []
    correct = 0
    t0 = time.perf_counter()
    step_times = []
    keep = set(keys)
    host_iter = (
        {k: v for k, v in b.items() if k in keep}
        for b in batcher.iter_batches(batch_size, shuffle=False)
    )
    for i, batch in enumerate(device_prefetch(host_iter, mesh,
                                              depth=prefetch_depth)):
        ts = time.perf_counter()
        preds, c = step(params, state, batch)
        preds_np = np.asarray(preds)
        correct += int(c)
        step_times.append(time.perf_counter() - ts)
        valid = np.asarray(batch["valid"]).astype(bool)
        all_preds.append(preds_np[valid])
        all_labels.append(np.asarray(batch["label"])[valid])
        if progress:
            print(f"Test batches {i}/{(n_total + batch_size - 1) // batch_size} ",
                  end="\r")
    wall = time.perf_counter() - t0
    labels = np.concatenate(all_labels)
    preds = np.concatenate(all_preds)
    acc = 100.0 * correct / n_total
    # Honest timing split: per-step wall here includes the host readback
    # of predictions (np.asarray), which over a remote/tunneled device can
    # dominate; pipeline_samples_per_s is the end-to-end number (what a
    # user sees), device-only throughput comes from bench.py's scan-based
    # measurement. Do NOT compare p50_step_s to bench.py batch latency.
    stats = {
        "wall_s": wall,
        "pipeline_samples_per_s": n_total / wall if wall > 0 else 0.0,
        # kept for backward compat; identical to pipeline_samples_per_s
        "samples_per_s": n_total / wall if wall > 0 else 0.0,
        "p50_step_s": float(np.percentile(step_times, 50)) if step_times else 0.0,
        "p50_includes_host_readback": True,
        "n": n_total,
    }
    return acc, labels, preds, stats


def run_image_eval(apply_fn, params, state, batcher: ImageTextBatcher,
                   batch_size: int, mesh=None, compute_dtype=jnp.bfloat16,
                   progress: bool = True, norm_stats=None,
                   prefetch_depth: int = 2
                   ) -> Tuple[float, np.ndarray, np.ndarray, Dict]:
    """Full-dataset image eval. Returns (acc%, labels, preds, stats)."""
    step = make_eval_step(apply_fn, mesh, compute_dtype, norm_stats=norm_stats)
    return run_eval(step, params, state, batcher, batch_size, mesh,
                    keys=("image", "label", "valid"), progress=progress,
                    prefetch_depth=prefetch_depth)
