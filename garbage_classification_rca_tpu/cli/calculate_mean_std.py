"""Dataset channel statistics — reference calculate_mean_std_dataset.py:1-51
and the in-trainer variant (main_image.py:212-235, --calculate_dataset_stats).

The reference estimates mean as an average of per-batch channel means and
std as an average of per-batch stds scaled by batch length — a biased
estimator. We compute BOTH: the reference-compatible numbers and the exact
streaming mean/std, and print the two side by side.
"""

from __future__ import annotations

import argparse

import numpy as np

from ..data.manifest import build_manifest
from ..data.images import load_rgb, resize_linear


def compute_stats(root: str, size=(384, 384), batch_size: int = 128):
    m = build_manifest(root)
    ch_sum = np.zeros(3)
    ch_sq = np.zeros(3)
    n_pix = 0
    ref_mean_sum = np.zeros(3)
    ref_std_sum = np.zeros(3)
    n_batches = 0
    batch = []
    for s in m.samples:
        batch.append(resize_linear(load_rgb(s.image_path), *size))
        if len(batch) == batch_size:
            _accum(batch, ch_sum, ch_sq, ref_mean_sum, ref_std_sum)
            n_pix += len(batch) * size[0] * size[1]
            n_batches += 1
            batch = []
    if batch:
        _accum(batch, ch_sum, ch_sq, ref_mean_sum, ref_std_sum)
        n_pix += len(batch) * size[0] * size[1]
        n_batches += 1
    exact_mean = ch_sum / n_pix / 255.0
    exact_std = np.sqrt(ch_sq / n_pix - (ch_sum / n_pix) ** 2) / 255.0
    ref_mean = ref_mean_sum / n_batches / 255.0
    ref_std = ref_std_sum / n_batches / 255.0
    return exact_mean, exact_std, ref_mean, ref_std


def _accum(batch, ch_sum, ch_sq, ref_mean_sum, ref_std_sum):
    x = np.stack(batch).astype(np.float64)          # [B, H, W, 3]
    ch_sum += x.sum(axis=(0, 1, 2))
    ch_sq += (x ** 2).sum(axis=(0, 1, 2))
    ref_mean_sum += x.mean(axis=(0, 1, 2))
    ref_std_sum += x.std(axis=(1, 2)).mean(axis=0) / len(batch) * len(batch)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_folder_name", required=True)
    p.add_argument("--size", type=int, default=384)
    a = p.parse_args(argv)
    em, es, rm, rs = compute_stats(a.dataset_folder_name, (a.size, a.size))
    print(f"exact mean: {em}\nexact std: {es}")
    print(f"reference-estimator mean: {rm}\nreference-estimator std: {rs}")


if __name__ == "__main__":
    main()
