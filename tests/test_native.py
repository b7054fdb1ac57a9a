"""Native C++ preprocessing vs the Python/cv2 reference path."""

import numpy as np
import pytest

from garbage_classification_rca_tpu.data.images import (
    pad_to_aspect_ratio, resize_linear)
from garbage_classification_rca_tpu import native


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("native lib unavailable (g++ build failed)")
    return l


def _python_path(img, h, w):
    # the eval path: pad to w/h (reference transposed-AR quirk) then resize
    padded = pad_to_aspect_ratio(img, w / h)
    return resize_linear(padded, h, w)


@pytest.mark.parametrize("shape,hw", [
    ((97, 143, 3), (224, 224)),
    ((300, 180, 3), (224, 224)),
    ((64, 64, 3), (480, 480)),
    ((123, 457, 3), (224, 256)),   # non-square target (b0 geometry)
])
def test_native_matches_cv2_path(lib, shape, hw):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, shape).astype(np.uint8)
    h, w = hw
    want = _python_path(img, h, w)
    got = native.pad_resize_batch([img], h, w, target_ar=w / h)
    assert got is not None and got.shape == (1, h, w, 3)
    diff = np.abs(got[0].astype(int) - want.astype(int))
    # fixed-point bilinear: allow 1 LSB of rounding skew on a tiny fraction
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 0.02


def test_native_batch_threads(lib):
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 256, (rng.integers(50, 200),
                                  rng.integers(50, 200), 3)).astype(np.uint8)
            for _ in range(16)]
    got = native.pad_resize_batch(imgs, 128, 128, 1.0, n_threads=4)
    assert got.shape == (16, 128, 128, 3)
    for i, im in enumerate(imgs):
        want = _python_path(im, 128, 128)
        assert np.abs(got[i].astype(int) - want.astype(int)).max() <= 1
