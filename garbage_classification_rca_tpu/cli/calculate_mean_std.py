"""Dataset channel statistics — reference calculate_mean_std_dataset.py:1-51
and the in-trainer variant (main_image.py:212-235, --calculate_dataset_stats).

The reference ships TWO different estimators, reproduced here exactly for
reporting (deterministic order; the reference shuffles, so its numbers
vary run to run):

  * tool (calculate_mean_std_dataset.py:22-38): mean = average of
    per-batch channel means; std = sqrt(avg E[X^2] - mean^2). Slightly
    biased when the last batch is short; otherwise sound.
  * trainer (main_image.py:228-233): ``std_sum += std(batch)/len(batch)``
    — the POOLED batch std divided by the batch size, i.e. ~1/128 of the
    real std. **Known reference defect**: normalizing with it would scale
    inputs ~128x. Recorded, not copied — --calculate_dataset_stats here
    normalizes with the EXACT stats (first two return values).
"""

from __future__ import annotations

import argparse

import numpy as np

from ..data.manifest import build_manifest
from ..data.images import load_rgb, resize_linear


def compute_stats(root: str, size=(384, 384), batch_size: int = 128):
    """-> (exact_mean, exact_std, estimators) — channel stats in [0, 1];
    ``estimators`` carries the two reference formulas' outputs."""
    m = build_manifest(root)
    ch_sum = np.zeros(3)
    ch_sq = np.zeros(3)
    n_pix = 0
    acc = {"mean": np.zeros(3), "sq": np.zeros(3), "tstd": np.zeros(3),
           "n": 0}
    batch = []
    for s in m.samples:
        batch.append(resize_linear(load_rgb(s.image_path), *size))
        if len(batch) == batch_size:
            _accum(batch, ch_sum, ch_sq, acc)
            n_pix += len(batch) * size[0] * size[1]
            batch = []
    if batch:
        _accum(batch, ch_sum, ch_sq, acc)
        n_pix += len(batch) * size[0] * size[1]
    exact_mean = ch_sum / n_pix / 255.0
    exact_std = np.sqrt(ch_sq / n_pix - (ch_sum / n_pix) ** 2) / 255.0
    nb = acc["n"]
    tool_mean = acc["mean"] / nb / 255.0
    tool_std = np.sqrt(acc["sq"] / nb - (acc["mean"] / nb) ** 2) / 255.0
    estimators = {
        "tool_mean": tool_mean, "tool_std": tool_std,
        "trainer_mean": acc["mean"] / nb / 255.0,
        "trainer_std": acc["tstd"] / nb / 255.0,     # the /len defect
    }
    return exact_mean, exact_std, estimators


def _accum(batch, ch_sum, ch_sq, acc):
    x = np.stack(batch).astype(np.float64)          # [B, H, W, 3]
    ch_sum += x.sum(axis=(0, 1, 2))
    ch_sq += (x ** 2).sum(axis=(0, 1, 2))
    acc["mean"] += x.mean(axis=(0, 1, 2))
    acc["sq"] += (x ** 2).mean(axis=(0, 1, 2))
    # main_image.py:229 torch.std: pooled batch std (Bessel), / batch len
    acc["tstd"] += x.std(axis=(0, 1, 2), ddof=1) / len(batch)
    acc["n"] += 1


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_folder_name", required=True)
    p.add_argument("--size", type=int, default=384)
    a = p.parse_args(argv)
    em, es, est = compute_stats(a.dataset_folder_name, (a.size, a.size))
    print(f"exact mean: {em}\nexact std: {es}")
    print(f"reference tool estimator mean: {est['tool_mean']}\n"
          f"reference tool estimator std: {est['tool_std']}")
    print(f"reference trainer estimator mean: {est['trainer_mean']}\n"
          f"reference trainer estimator std: {est['trainer_std']} "
          "(defective /batch-len scaling, see docstring)")


if __name__ == "__main__":
    main()
