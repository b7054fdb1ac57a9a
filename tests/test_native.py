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


@pytest.fixture(scope="module")
def dec_lib():
    l = native.get_decode_lib()
    if l is None:
        pytest.skip("native decode lib unavailable (g++/libjpeg missing)")
    return l


def _jpeg_bytes(arr, mode="RGB", quality=90, subsampling=0):
    import io

    from PIL import Image

    b = io.BytesIO()
    Image.fromarray(arr, mode).save(b, "JPEG", quality=quality,
                                    subsampling=subsampling)
    return b.getvalue()


@pytest.mark.parametrize("shape,quality,subsampling", [
    ((97, 143, 3), 90, 0),     # 4:4:4
    ((300, 180, 3), 75, 2),    # 4:2:0 — the common camera default
    ((64, 64, 3), 95, 1),      # 4:2:2
])
def test_native_decode_matches_pil_path(dec_lib, shape, quality,
                                        subsampling):
    """Fused decode+pad+resize must be BIT-IDENTICAL to PIL decode ->
    pad_resize (both wrap libjpeg-turbo in this image; the opt-in env
    gate exists for containers where that could drift)."""
    import io

    from PIL import Image

    rng = np.random.default_rng(hash(shape) % 2**31)
    arr = rng.integers(0, 255, shape, dtype=np.uint8)
    blob = _jpeg_bytes(arr, quality=quality, subsampling=subsampling)
    with Image.open(io.BytesIO(blob)) as im:
        decoded = np.asarray(im.convert("RGB"))
    want = native.pad_resize_batch([decoded], 224, 224, target_ar=1.0)
    got, ok = native.decode_pad_resize_batch([blob], 224, 224,
                                             target_ar=1.0)
    assert ok.all()
    np.testing.assert_array_equal(got[0], want[0])


def test_native_decode_grayscale_and_failures(dec_lib):
    """Grayscale JPEGs convert to RGB in-decoder; non-JPEG bytes are
    flagged (ok=False) with the slot zeroed for the PIL fallback."""
    rng = np.random.default_rng(7)
    gray = rng.integers(0, 255, (50, 60), dtype=np.uint8)
    blob = _jpeg_bytes(gray, mode="L")
    got, ok = native.decode_pad_resize_batch(
        [blob, b"\x89PNG not a jpeg"], 32, 32, target_ar=1.0)
    assert ok.tolist() == [True, False]
    assert (got[1] == 0).all()
    import io

    from PIL import Image

    with Image.open(io.BytesIO(blob)) as im:     # JPEG is lossy: the
        decoded = np.asarray(im.convert("RGB"))  # oracle must re-decode
    want = native.pad_resize_batch([decoded], 32, 32, target_ar=1.0)
    np.testing.assert_array_equal(got[0], want[0])


def test_batcher_native_decode_matches_default(tmp_path, dec_lib,
                                               monkeypatch):
    """End-to-end: GC_RCA_NATIVE_DECODE=1 batches must equal the default
    PIL-route batches exactly, including a non-JPEG file that exercises
    the per-image fallback."""
    from PIL import Image

    from garbage_classification_rca_tpu.data.manifest import build_manifest
    from garbage_classification_rca_tpu.data.pipeline import ImageTextBatcher

    rng = np.random.default_rng(3)
    for cls in ("black", "blue", "green", "ttr"):
        d = tmp_path / cls
        d.mkdir()
        arr = rng.integers(0, 255, (70, 90, 3), dtype=np.uint8)
        Image.fromarray(arr, "RGB").save(d / f"{cls}_item_1.jpg",
                                         quality=85)
    # one PNG in the tree -> native decode refuses it, PIL fallback covers
    Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8),
                    "RGB").save(tmp_path / "black" / "black_item_2.png")

    m = build_manifest(str(tmp_path))

    def batches(env):
        monkeypatch.setenv("GC_RCA_NATIVE_DECODE", env)
        b = ImageTextBatcher(m, (48, 48), workers=2)
        try:
            return [dict(x) for x in b.iter_batches(4, shuffle=False)]
        finally:
            b.close()

    want = batches("0")
    got = batches("1")
    assert len(want) == len(got)
    for bw, bg in zip(want, got):
        for k in bw:
            np.testing.assert_array_equal(bg[k], bw[k])


def test_native_decode_refuses_truncated_jpeg(dec_lib):
    """A truncated JPEG must be flagged ok=False (libjpeg's premature-EOF
    is only a WARNING that fakes an EOI and yields a gray tail; the PIL
    route raises loudly instead — the loadable set must not change)."""
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
    blob = _jpeg_bytes(arr)
    truncated = blob[: len(blob) // 2]
    got, ok = native.decode_pad_resize_batch([truncated, blob], 48, 48,
                                             target_ar=1.0)
    assert ok.tolist() == [False, True]
    assert (got[0] == 0).all()
