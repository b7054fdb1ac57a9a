"""Per-stage profile of the MM-RCA full-fine-tune train step (VERDICT r2
item 5: prove where the ~56%-of-calibration gap lives or close it).

Method: jit each segment as its own program, read XLA's own
``cost_analysis()`` (flops / bytes accessed) from the lowered module, and
time an on-device ``lax.scan`` of N steps (the axon tunnel's
block_until_ready doesn't block, so a single-scalar-returning scan is the
only honest timer — bench.py methodology). Effective TF/s and GB/s per
segment then place each on the chip roofline (v5e: ~197 TF/s bf16 peak,
107 TF/s measured matmul-chain calibration, ~820 GB/s HBM).

Segments (all fwd+bwd via jax.grad, batch 16 @480, bf16 compute):
  txt   DistilBERT tower
  img3  EffNetV2-M stem..stage3 (the fused-MBConv + early-MB half)
  img   EffNetV2-M full trunk (stem..final_conv+pool)
  full  the production train step (towers + fusion head + SGD update)

Run:  python tools/profile_mm_rca_train.py          (on the TPU)
      GC_RCA_PLATFORM=cpu:1 python ... --steps 2    (CPU smoke)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--seq", type=int, default=64)
    ap.add_argument("--eval", action="store_true",
                    help="profile the EVAL forward (BN-folded, bf16, "
                         "Pallas RCA) instead of the train step")
    args = ap.parse_args()

    plat = os.environ.get("GC_RCA_PLATFORM")
    if plat:
        import jax
        name, _, n = plat.partition(":")
        jax.config.update("jax_platforms", name)
        if name == "cpu":
            jax.config.update("jax_num_cpu_devices", int(n) if n else 1)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from garbage_classification_rca_tpu.data.images import normalize_on_device
    from garbage_classification_rca_tpu.models.fusion import (
        FusionConfig, build_fusion)
    from garbage_classification_rca_tpu.models.image import (
        efficientnet_common as effc, efficientnet_v2 as effv2)
    from garbage_classification_rca_tpu.models.text import distilbert as distil
    from garbage_classification_rca_tpu.train.loop import make_train_step
    from garbage_classification_rca_tpu.train.optim import make_optimizer

    B, L, steps = args.batch, args.seq, args.steps
    cfg = FusionConfig(strategy="MM_RCA", reverse=True,
                       use_pallas_rca=jax.default_backend() == "tpu")
    init_fn, apply_fn, _ = build_fusion(cfg)
    params, state = init_fn(jax.random.PRNGKey(0))
    ecfg = effv2.CONFIGS["eff_v2_medium"]

    rng = np.random.default_rng(0)
    u8 = jax.device_put(rng.integers(0, 255, (B, 480, 480, 3)
                                     ).astype(np.uint8))
    ids = jax.device_put(rng.integers(100, 30000, (B, L)).astype(np.int32))
    mask = jax.device_put(np.ones((B, L), np.int32))
    labels = jax.device_put(rng.integers(0, 4, (B,)).astype(np.int32))

    def timed(name, make_fn, *inputs):
        """make_fn(*inputs) -> scalar; scans it `steps` times on device."""
        @jax.jit
        def run(*inputs):
            def body(acc, _):
                # carry-dependency defeats loop-invariant hoisting
                out = make_fn(acc, *inputs)
                return out.astype(jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
            return acc

        lowered = jax.jit(lambda *i: make_fn(jnp.float32(0), *i)).lower(*inputs)
        cost = lowered.compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else (cost or {})
        gflops = cost.get("flops", 0.0) / 1e9
        gbytes = cost.get("bytes accessed", 0.0) / 1e9

        float(run(*inputs))                        # compile + warm
        t0 = time.perf_counter()
        float(run(*inputs))
        ms = (time.perf_counter() - t0) / steps * 1e3
        tfs = gflops / ms if ms else 0.0           # GF / ms == TF/s
        print(f"{name:<28} {ms:9.2f} ms  {gflops:9.1f} GF  "
              f"{tfs:7.1f} TF/s  {gbytes:7.2f} GB  {gbytes / ms:7.2f} TB/s"
              if ms else name, flush=True)
        return ms, gflops, gbytes

    f32 = jnp.float32

    if args.eval:
        return _eval_profile(args, timed, cfg, apply_fn, params, state,
                             ecfg, u8, ids, mask)

    # --- text tower fwd+bwd ---
    tparams = params["text"]

    def txt_loss(p, jitter):
        # real carry dependence (not *0 — XLA would fold it and hoist the
        # whole grad out of the timing scan)
        j = (jitter.astype(jnp.int32) % 2)
        h = distil.encode(p, ids + j, mask)
        return jnp.sum(h[:, 0].astype(f32))

    def txt_seg(acc, tp):
        g = jax.grad(txt_loss)(tp, acc)
        return acc + jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b.astype(f32)), g, f32(0))

    # --- image tower: full trunk fwd+bwd ---
    iparams, istate = params["image"], state["image"]

    def img_loss(p, jitter, n_stages):
        x = normalize_on_device(u8 + (jitter.astype(jnp.int32) % 2
                                      ).astype(jnp.uint8),
                                dtype=jnp.bfloat16)
        if n_stages == len(ecfg.stages):
            _, pooled, _ = effc.features_all_stages(
                p, istate, x, ecfg, train=True, rng=jax.random.PRNGKey(0))
            return jnp.sum(pooled.astype(f32))
        # prefix stack: stem + stages[:n_stages] only (features_all_stages
        # unconditionally runs the 512->1280 head conv, which a truncated
        # last stage can't feed)
        eps, mom = ecfg.bn_eps, ecfg.bn_momentum
        total = sum(r[-1] for r in ecfg.stages)
        h, _ = effc._cna(p["stem"], istate["stem"], x, stride=2, train=True,
                         eps=eps, momentum=mom)
        idx = 0
        rng_ = jax.random.PRNGKey(0)
        for si in range(n_stages):
            row = ecfg.stages[si]
            for j, (bp, bs) in enumerate(zip(p["stages"][si],
                                             istate["stages"][si])):
                brng = jax.random.fold_in(rng_, si * 1000 + j)
                sd = ecfg.sd_prob * idx / total
                h, _ = effc._block(bp, bs, h, row, j == 0, eps=eps,
                                   momentum=mom, sd_rate=sd, train=True,
                                   rng=brng)
                idx += 1
        return jnp.sum(h.astype(f32))

    def img_seg_full(acc, ip):
        g = jax.grad(img_loss)(ip, acc, len(ecfg.stages))
        return acc + jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b.astype(f32)), g, f32(0))

    def img_seg_3(acc, ip):
        g = jax.grad(img_loss)(ip, acc, 4)     # stem..stage3 (stages[0:4])
        return acc + jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b.astype(f32)), g, f32(0))

    # --- full production train step ---
    opt = make_optimizer("sgd", lr=1.6e-3, reg=0.03)
    opt_state = opt.init(params)

    def batch_to_inputs(mb):
        return (mb["input_ids"], mb["attention_mask"],
                normalize_on_device(mb["image"], dtype=jnp.bfloat16))

    def apply_adapter(p, s, inputs, *, train=False, rng=None):
        return apply_fn(p, s, inputs, train=train, rng=rng)

    step = make_train_step(apply_adapter, opt,
                           batch_to_inputs=batch_to_inputs)

    def full_seg(acc, p, s, o):
        batch = {"image": u8[None] + (acc % 2).astype(jnp.uint8),
                 "input_ids": ids[None], "attention_mask": mask[None],
                 "label": labels[None]}
        p2, _, _, loss, _ = step(p, s, o, batch, jax.random.PRNGKey(1))
        # consume EVERY updated param: returning only `loss` lets XLA
        # dead-code-eliminate the whole backward + optimizer (measured:
        # 24.5 ms / 897 GF = exactly the forward)
        psum = jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b.astype(f32)), p2, f32(0))
        return acc + loss.astype(f32) + psum * f32(1e-12)

    print(f"MM-RCA train per-stage profile  (bs={B} @480, seq={L}, bf16, "
          f"backend={jax.default_backend()}, scan={steps})")
    print(f"{'segment':<28} {'ms/step':>9}     {'flops':>9}  {'eff':>7}"
          f"     {'bytes':>5}  {'bw':>9}")
    t_txt = timed("txt: DistilBERT fwd+bwd", txt_seg, tparams)
    t_im3 = timed("img: stem..stage3 fwd+bwd", img_seg_3, iparams)
    t_img = timed("img: full trunk fwd+bwd", img_seg_full, iparams)
    t_all = timed("FULL train step (prod)", full_seg, params, state,
                  opt_state)
    resid = t_all[0] - t_img[0] - t_txt[0]
    print(f"{'residual (head+opt+loss)':<28} {resid:9.2f} ms")
    print(f"late trunk (stage4..final) = {t_img[0] - t_im3[0]:.2f} ms of "
          f"the image tower's {t_img[0]:.2f} ms")


def _eval_profile(args, timed, cfg, apply_fn, params, state, ecfg, u8, ids,
                  mask):
    """Eval-forward segments: BN-folded image trunk, text tower, full
    eval forward (towers + fused Pallas RCA head), matching bench.py's
    MM-RCA eval configuration."""
    import jax
    import jax.numpy as jnp

    from garbage_classification_rca_tpu.data.images import normalize_on_device
    from garbage_classification_rca_tpu.models.image import (
        efficientnet_common as effc)
    from garbage_classification_rca_tpu.models.text import distilbert as distil
    from garbage_classification_rca_tpu.nn.fold import fold_batchnorm

    f32 = jnp.float32
    params["image"], state["image"] = fold_batchnorm(
        params["image"], state["image"], 1e-3)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params)

    def txt_seg(acc, tp):
        j = (acc.astype(jnp.int32) % 2)
        h = distil.encode(tp, ids + j, mask)
        return jnp.sum(h[:, 0].astype(f32))

    def img_seg(acc, ip):
        x = normalize_on_device(u8 + (acc.astype(jnp.int32) % 2
                                      ).astype(jnp.uint8),
                                dtype=jnp.bfloat16)
        _, pooled, _ = effc.features_all_stages(ip, state["image"], x, ecfg)
        return jnp.sum(pooled.astype(f32))

    def full_seg(acc, p):
        x = normalize_on_device(u8 + (acc.astype(jnp.int32) % 2
                                      ).astype(jnp.uint8),
                                dtype=jnp.bfloat16)
        logits, _ = apply_fn(p, state, (ids, mask, x), train=False,
                             eval_mode=True)
        return jnp.sum(logits.astype(f32))

    print(f"MM-RCA EVAL per-stage profile  (bs={args.batch} @480, "
          f"seq={args.seq}, bf16, BN-folded, "
          f"backend={jax.default_backend()}, scan={args.steps})")
    print(f"{'segment':<28} {'ms/step':>9}     {'flops':>9}  {'eff':>7}"
          f"     {'bytes':>5}  {'bw':>9}")
    t_txt = timed("txt: DistilBERT fwd", txt_seg, params["text"])
    t_img = timed("img: EffNetV2-M fwd (folded)", img_seg, params["image"])
    t_all = timed("FULL eval forward", full_seg, params)
    print(f"{'residual (RCA head)':<28} "
          f"{t_all[0] - t_img[0] - t_txt[0]:9.2f} ms")


if __name__ == "__main__":
    main()
