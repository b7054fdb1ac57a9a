"""Headline benchmark — eval samples/sec/chip on the flagship config.

Runs on real TPU hardware (the driver executes this at the end of every
round). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measurement methodology (axon-tunnel quirks, measured 2026-08-16):
  * ``block_until_ready`` does NOT block over the tunnel and host readback
    runs ~1 MB/s — so each bench compiles ONE program that lax.scans N
    forward steps on device and returns a single scalar; wall time of the
    second invocation / N is the per-batch time. Calibration: a bf16
    matmul chain measures 107 TFLOP/s on this v5e chip (peak ~197).
  * remote compile is slow (~3 min per program) — exactly two programs are
    compiled (warmup reuses the same executable).

Headline metric: ViT-B/16 image-eval throughput (samples/sec/chip, bf16
compute, uint8 batch, normalize fused into the forward) — the
`transformer_B16` config of BASELINE.json.

vs_baseline: the reference publishes no numbers (BASELINE.md). Estimate for
the reference PyTorch pipeline (ViT-B/16 fp32 eval, V100L, DataLoader-fed):
~330 samples/s. BASELINE.json goal is >=10x/chip => vs_baseline >= 10.
"""

from __future__ import annotations

import json
import time

REFERENCE_VIT_B16_EVAL_SPS = 330.0  # V100L fp32 estimate (no published number)
SCAN_STEPS = 20


def bench_vit_b16(batch_size: int = 64):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from garbage_classification_rca_tpu.data.images import normalize_on_device
    from garbage_classification_rca_tpu.models import get_image_model

    mdef = get_image_model("transformer_B16")
    params, state = mdef.init(jax.random.PRNGKey(0), num_classes=4)
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)

    @jax.jit
    def run(params, images):
        def body(acc, _):
            # serial dependency on the carry: prevents XLA loop-invariant
            # code motion from computing the forward once (observed: a
            # carry-independent body benched at 518 TFLOP/s, 2.6x chip peak)
            imgs = images + (acc % 2).astype(jnp.uint8)
            x = normalize_on_device(imgs, dtype=jnp.bfloat16)
            logits, _ = mdef.apply(params, state, x, train=False, rng=None)
            preds = jnp.argmax(logits.astype(jnp.float32), axis=-1)
            return acc + jnp.sum(preds), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), None, length=SCAN_STEPS)
        return acc

    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.integers(0, 255, (batch_size, 224, 224, 3)).astype(np.uint8))
    int(run(params, images))          # compile + first run
    t0 = time.perf_counter()
    int(run(params, images))          # timed: N batches on device
    wall = time.perf_counter() - t0
    per_batch = wall / SCAN_STEPS
    return batch_size / per_batch, per_batch


def bench_mm_rca(batch_size: int = 128):
    """Flagship multimodal eval: MM-RCA (EffNetV2-M@480 + DistilBERT +
    fused Pallas RCA block), bf16, uint8 images — BASELINE.json config #4.
    The reference runs this at bs=16 on a V100 (calculate_test_accuracy_
    both.py:159), est. ~45 samples/s."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from garbage_classification_rca_tpu.data.images import normalize_on_device
    from garbage_classification_rca_tpu.models.fusion import (
        FusionConfig, build_fusion)

    cfg = FusionConfig(strategy="MM_RCA", reverse=True,
                       use_pallas_rca=jax.default_backend() == "tpu")
    init_fn, apply_fn, _ = build_fusion(cfg)
    params, state = init_fn(jax.random.PRNGKey(0))
    # eval-time conv+BN folding on the image tower (-21% measured)
    from garbage_classification_rca_tpu.nn.fold import fold_batchnorm
    params["image"], state["image"] = fold_batchnorm(
        params["image"], state["image"], 1e-3)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params)

    @jax.jit
    def run(params, ids, mask, images):
        def body(acc, _):
            imgs = images + (acc % 2).astype(jnp.uint8)
            x = normalize_on_device(imgs, dtype=jnp.bfloat16)
            logits, _ = apply_fn(params, state, (ids, mask, x),
                                 train=False, eval_mode=True)
            preds = jnp.argmax(logits.astype(jnp.float32), axis=-1)
            return acc + jnp.sum(preds), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), None, length=SCAN_STEPS)
        return acc

    rng = np.random.default_rng(0)
    ids = jax.device_put(rng.integers(100, 30000, (batch_size, 64)).astype(np.int32))
    mask = jax.device_put(np.ones((batch_size, 64), np.int32))
    images = jax.device_put(
        rng.integers(0, 255, (batch_size, 480, 480, 3)).astype(np.uint8))
    int(run(params, ids, mask, images))
    t0 = time.perf_counter()
    int(run(params, ids, mask, images))
    wall = time.perf_counter() - t0
    per_batch = wall / SCAN_STEPS
    return batch_size / per_batch, per_batch


REFERENCE_MM_RCA_EVAL_SPS = 45.0  # V100L bs16 estimate (no published number)


def bench_blip2(batch_size: int = 8):
    """BASELINE config #5: BLIP-2 (full 3.74B: EVA ViT-g + Q-Former +
    OPT-2.7b, bf16 on-chip) 1-token constrained-decode eval. Reference:
    HF generate(max_new_tokens=1) at bs16 on V100, est. ~15 img/s.
    Measured here: init 41 s, compile ~3 min, 90 ms/batch8 -> ~89 img/s."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from garbage_classification_rca_tpu.models.vlm import blip2
    from garbage_classification_rca_tpu.cli.blip2_common import normalize_clip

    cfg = blip2.Blip2Config()
    params = blip2.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    @jax.jit
    def run(params, pix, ids, mask):
        def body(acc, _):
            px = pix + (acc % 2).astype(jnp.uint8)
            x = normalize_clip(px)
            logits = blip2.next_token_logits(params, x, ids, mask, cfg)
            return acc + jnp.sum(jnp.argmax(logits.astype(jnp.float32), -1)
                                 ).astype(jnp.int32), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), None, length=SCAN_STEPS)
        return acc

    rng = np.random.default_rng(0)
    pix = jax.device_put(rng.integers(0, 255, (batch_size, 224, 224, 3)
                                      ).astype(np.uint8))
    ids = jax.device_put(rng.integers(4, 50000, (batch_size, 100)
                                      ).astype(np.int32))
    mask = jax.device_put(np.ones((batch_size, 100), np.int32))
    int(run(params, pix, ids, mask))
    t0 = time.perf_counter()
    int(run(params, pix, ids, mask))
    wall = time.perf_counter() - t0
    return batch_size / (wall / SCAN_STEPS)


REFERENCE_BLIP2_EVAL_SPS = 15.0  # V100 bs16 generate(1 token) estimate


def main():
    import jax

    n_chips = max(len(jax.devices()), 1)
    sps, per_batch = bench_vit_b16()
    sps_chip = sps / n_chips
    print(f"# ViT-B16 eval: {sps:.1f} samples/s on {n_chips} chip(s), "
          f"batch latency {per_batch * 1e3:.2f} ms (bs=64, bf16)")
    # headline JSON first: the sub-benches below compile for minutes and a
    # runner timeout must not cost the recorded metric
    print(json.dumps({
        "metric": "vit_b16_eval_samples_per_sec_per_chip",
        "value": round(sps_chip, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(sps_chip / REFERENCE_VIT_B16_EVAL_SPS, 2),
    }), flush=True)
    try:
        mm_sps, mm_batch = bench_mm_rca()
        mm_chip = mm_sps / n_chips
        print(f"# MM-RCA eval: {mm_sps:.1f} samples/s on {n_chips} chip(s), "
              f"batch latency {mm_batch * 1e3:.2f} ms (bs=128, 480px, bf16, "
              f"vs_baseline~{mm_chip / REFERENCE_MM_RCA_EVAL_SPS:.1f}x)")
    except Exception as e:  # never lose the headline JSON line
        print(f"# MM-RCA bench failed: {type(e).__name__}: {e}")
    try:
        import os
        if os.environ.get("GC_RCA_BENCH_BLIP2", "1") != "0":
            b_sps = bench_blip2()
            print(f"# BLIP-2 (3.74B) 1-token eval: {b_sps:.1f} samples/s on "
                  f"{n_chips} chip(s) (bs=8, bf16, "
                  f"vs_baseline~{b_sps / n_chips / REFERENCE_BLIP2_EVAL_SPS:.1f}x)")
    except Exception as e:
        print(f"# BLIP-2 bench failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
