"""Dataset channel-stats estimators vs torch oracles of the reference's
two (different) formulas (calculate_mean_std_dataset.py:22-38 tool,
main_image.py:228-233 in-trainer — the latter's /batch-len std defect is
reproduced for reporting and fixed for actual normalization)."""

import numpy as np
import torch

from garbage_classification_rca_tpu.cli.calculate_mean_std import (
    compute_stats)
from garbage_classification_rca_tpu.data.images import load_rgb, resize_linear


def _batches(ds_root, size, batch_size):
    from garbage_classification_rca_tpu.data.manifest import build_manifest

    m = build_manifest(str(ds_root))
    imgs = [resize_linear(load_rgb(s.image_path), *size) for s in m.samples]
    for i in range(0, len(imgs), batch_size):
        yield torch.tensor(np.stack(imgs[i:i + batch_size]).astype(
            np.float32)).permute(0, 3, 1, 2)


def test_stats_match_reference_oracles(tiny_dataset):
    size, bs = (32, 32), 5
    em, es, est = compute_stats(str(tiny_dataset), size, batch_size=bs)

    # tool oracle: calculate_mean_std_dataset.py:22-38 (images in [0,255]
    # here; the tool consumes ToTensor [0,1] floats — same up to /255)
    ch_sum = ch_sq = nb = 0
    t_mean_sum = t_std_sum = 0
    for images in _batches(tiny_dataset, size, bs):
        ch_sum = ch_sum + torch.mean(images, dim=[0, 2, 3])
        ch_sq = ch_sq + torch.mean(images ** 2, dim=[0, 2, 3])
        # trainer oracle: main_image.py:228-233
        t_mean_sum = t_mean_sum + torch.mean(images * 1.0, dim=[0, 2, 3])
        t_std_sum = t_std_sum + torch.std(images * 1.0, dim=[0, 2, 3]) \
            / images.shape[0]
        nb += 1
    tool_mean = (ch_sum / nb) / 255
    tool_std = torch.sqrt(ch_sq / nb - (ch_sum / nb) ** 2) / 255
    trainer_mean = (t_mean_sum / nb) / 255
    trainer_std = (t_std_sum / nb) / 255

    np.testing.assert_allclose(est["tool_mean"], tool_mean.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(est["tool_std"], tool_std.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(est["trainer_mean"], trainer_mean.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(est["trainer_std"], trainer_std.numpy(),
                               rtol=1e-4, atol=1e-5)

    # the exact stats are the true pixel mean/std (normalization input)
    allpix = np.concatenate(
        [np.stack([resize_linear(load_rgb(s.image_path), *size)]).reshape(
            -1, 3).astype(np.float64)
         for s in __import__(
             "garbage_classification_rca_tpu.data.manifest",
             fromlist=["build_manifest"]).build_manifest(
                 str(tiny_dataset)).samples])
    np.testing.assert_allclose(em, allpix.mean(0) / 255, rtol=1e-6)
    np.testing.assert_allclose(es, allpix.std(0) / 255, rtol=1e-5)

    # the trainer estimator's defect: its std is ~1/batch_len of the real
    # one (normalizing with it would blow inputs up ~bs x)
    assert (est["trainer_std"] < es / 2).all()
