"""Class balancing: weighted CE weights + imbalanced (re)sampler.

  * class weights: total / (C * count_c) — reference main_image.py:65-82,
    exposed on the Manifest (manifest.class_weights()).
  * ImbalancedSampler: per-sample weight 1/class_count, sampled WITH
    replacement to the dataset length — reference
    imbalanced_sampler/imbalanced.py:9-69 (weights :36-45, torch.multinomial
    replacement=True :65-66), wired via --balanced_sampler
    (main_both.py:478-532).
"""

from __future__ import annotations

import numpy as np

from .manifest import Manifest


def imbalanced_sample_order(manifest: Manifest, seed: int,
                            num_samples: int | None = None) -> np.ndarray:
    labels = np.asarray(manifest.labels())
    counts = np.bincount(labels, minlength=len(manifest.classes))
    weights = 1.0 / counts[labels]
    p = weights / weights.sum()
    rng = np.random.default_rng(seed)
    n = num_samples or len(labels)
    return rng.choice(len(labels), size=n, replace=True, p=p)
