"""Host ingest micro-benchmark: PIL decode route vs fused native decode.

Times the two make_batch image paths (PIL decode -> C++ pad+resize vs
C++ decode+pad+resize in one pass, GC_RCA_NATIVE_DECODE=1) on synthetic
camera-resolution JPEGs. Pure host-side — no JAX/TPU involved.

Usage: python tools/bench_decode.py [--n 64] [--src-h 3000] [--src-w 4000]
       [--target 480] [--threads 0]
"""

from __future__ import annotations

import argparse
import io
import sys
import time

import numpy as np
from PIL import Image

sys.path.insert(0, ".")

from garbage_classification_rca_tpu import native  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--src-h", type=int, default=3000)
    ap.add_argument("--src-w", type=int, default=4000)
    ap.add_argument("--target", type=int, default=480)
    ap.add_argument("--threads", type=int, default=0)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    # low-frequency content compresses like a photo (pure noise inflates
    # decode cost unrealistically)
    base = rng.integers(0, 255, (args.src_h // 8, args.src_w // 8, 3),
                        dtype=np.uint8)
    img = np.asarray(Image.fromarray(base).resize(
        (args.src_w, args.src_h), Image.BILINEAR))
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=85)
    blob = buf.getvalue()
    blobs = [blob] * args.n
    t = args.target
    print(f"{args.n} JPEGs {args.src_w}x{args.src_h} "
          f"({len(blob) / 1e6:.1f} MB each) -> {t}x{t}")

    import concurrent.futures as cf

    pool = cf.ThreadPoolExecutor(max_workers=args.threads or None)

    def _decode(b):
        with Image.open(io.BytesIO(b)) as im:
            return np.asarray(im.convert("RGB"))

    def pil_path():
        # mirror the production batcher: PIL decode fanned over a thread
        # pool, then the C++ batch pad+resize
        decoded = list(pool.map(_decode, blobs))
        return native.pad_resize_batch(decoded, t, t, target_ar=1.0,
                                       n_threads=args.threads)

    def native_path():
        out, ok = native.decode_pad_resize_batch(blobs, t, t, target_ar=1.0,
                                                 n_threads=args.threads)
        assert ok.all()
        return out

    if native.get_decode_lib() is None:
        print("native decode lib unavailable; nothing to compare")
        return

    for name, fn in (("pil+native_resize", pil_path),
                     ("native_fused", native_path)):
        fn()  # warm (build libs, page in)
        best = min(
            (lambda t0=time.perf_counter(): (fn(), time.perf_counter() - t0)
             )()[1] for _ in range(args.reps))
        print(f"{name:>20}: {best:6.3f} s  "
              f"({args.n / best:7.1f} img/s)")

    np.testing.assert_array_equal(pil_path(), native_path())
    print("outputs bit-identical")


if __name__ == "__main__":
    main()
