"""Measure the flash-with-fused-dropout training win (VERDICT r4 weak #3).

Runs the DistilBERT classifier TRAIN step (the --hf_internal_dropout
text-tower config — attention-probs p=0.1, where the fused-mask kernel
actually fires) and the BLIP-2 LoRA train step (attention_dropout=0.0 —
plain flash restored under dropout) on the real TPU, flash on vs off,
using bench.py's scan methodology. Results belong in docs/DESIGN.md's
round-5 flash-dropout table.

Usage (serialize with other TPU jobs):
    python tools/measure_flash_dropout.py [--steps 8] [--bs 256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def bench_train_distilbert(batch_size: int, seq_len: int, steps: int,
                           hf_internal_dropout: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from garbage_classification_rca_tpu.models.text import distilbert as jd
    from garbage_classification_rca_tpu.train.loop import make_train_step
    from garbage_classification_rca_tpu.train.optim import make_optimizer

    params, state = jd.init(jax.random.PRNGKey(0), num_classes=4)
    opt = make_optimizer("sgd", lr=1e-3, reg=1e-4)
    opt_state = opt.init(params)

    def batch_to_inputs(mb):
        return (mb["input_ids"], mb["attention_mask"])

    def apply_fn(p, s, inputs, *, train=False, rng=None):
        return jd.apply(p, s, inputs, train=train, rng=rng,
                        hf_internal_dropout=hf_internal_dropout)

    step = make_train_step(apply_fn, opt, compute_dtype=jnp.bfloat16,
                           batch_to_inputs=batch_to_inputs)

    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jax.device_put(rng.integers(
            100, 30000, (1, batch_size, seq_len)).astype(np.int32)),
        "attention_mask": jax.device_put(
            np.ones((1, batch_size, seq_len), np.int32)),
        "label": jax.device_put(rng.integers(
            0, 4, (1, batch_size)).astype(np.int32)),
    }

    @jax.jit
    def run(params, state, opt_state, batch, key):
        def body(carry, i):
            params, state, opt_state = carry
            b = dict(batch)
            b["input_ids"] = batch["input_ids"] + (i % 2)
            params, state, opt_state, loss, _ = step(
                params, state, opt_state, b, jax.random.fold_in(key, i))
            return (params, state, opt_state), loss
        (params, _, _), losses = jax.lax.scan(
            body, (params, state, opt_state), jnp.arange(steps))
        return losses[-1]

    key = jax.random.PRNGKey(0)
    float(run(params, state, opt_state, batch, key))
    t0 = time.perf_counter()
    float(run(params, state, opt_state, batch, key))
    wall = time.perf_counter() - t0
    return batch_size * steps / wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--bs", type=int, default=256)
    ap.add_argument("--seq", type=int, default=64)
    ap.add_argument("--skip_blip2", action="store_true")
    args = ap.parse_args()

    import os

    for flash in ("1", "0"):
        os.environ["GC_RCA_FLASH_BWD"] = flash
        for drop in (True, False):
            sps = bench_train_distilbert(args.bs, args.seq, args.steps,
                                         drop)
            print(f"distilbert train bs{args.bs} seq{args.seq} "
                  f"hf_drop={int(drop)} flash={flash}: {sps:.1f} "
                  "samples/s", flush=True)

    if not args.skip_blip2:
        import bench

        for flash in ("1", "0"):
            os.environ["GC_RCA_FLASH_BWD"] = flash
            sps = bench.bench_train_blip2(hf_internal_dropout=True)
            print(f"blip2 LoRA train mb16 acc2 hf_drop=1 flash={flash}: "
                  f"{sps:.1f} samples/s", flush=True)


if __name__ == "__main__":
    main()
