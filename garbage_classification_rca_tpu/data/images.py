"""Host-side image decode + geometry; device-side normalization.

Split of responsibilities (TPU-first):
  * host: JPEG decode (PIL), pad-to-aspect-ratio (np.pad), INTER_LINEAR
    resize (cv2) -> fixed-shape uint8 [H, W, 3]. uint8 keeps the H2D copy
    3-4x smaller than fp32.
  * device: ``(x/255 - mean)/std`` normalization fused by XLA into the
    model's first conv (see eval/harness.py) — never a separate pass over
    HBM.

Geometry parity with the reference eval pipeline
(calculate_test_accuracy_image.py:235-242 = PadToAR -> Resize -> Normalize):
  * ``pad_to_aspect_ratio`` replicates keep_aspect_ratio.py:18-53 exactly,
    including its quirks: AR computed as shape[0]/shape[1] with the
    variables named width/height swapped, int() truncation, and both sides
    padded by int(pad/2) (an odd pad loses one pixel — kept for parity).
  * resize is cv2.INTER_LINEAR, identical to A.Resize(interpolation=
    cv2.INTER_LINEAR).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def load_rgb(path: str) -> np.ndarray:
    """Decode to uint8 RGB HWC (reference pil_loader,
    CustomImageTextFolder.py:353-357)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def pad_to_aspect_ratio(img: np.ndarray, aspect_ratio: float) -> np.ndarray:
    """Zero-pad to `aspect_ratio`, reproducing keep_aspect_ratio.py:24-50
    exactly — including its quirks. The reference compares H/W (shape[0]/
    shape[1]) against the target, but its local names width/height are
    swapped, so the pad AMOUNT mixes axes while the padded AXIS follows the
    branch comment:

      * H/W < target ("increase width"):  pad WIDTH by int(target*W) - H
      * H/W > target ("increase height"): pad HEIGHT by int(H/target) - W

    both sides padded by int(pad/2) (an odd pad loses one pixel — kept).
    Verified by executing the reference transform: (40,80)@AR1 -> (40,120),
    (80,40)@AR1 -> (120,40), (33,47)@AR1 -> (33,61)."""
    h, w = img.shape[0], img.shape[1]
    current = h / w
    if current == aspect_ratio:
        return img
    if current < aspect_ratio:
        pad = int(aspect_ratio * w) - h
        half = int(pad / 2)
        return np.pad(img, ((0, 0), (half, half), (0, 0)), mode="constant")
    pad = int(h / aspect_ratio) - w
    half = int(pad / 2)
    return np.pad(img, ((half, half), (0, 0), (0, 0)), mode="constant")


def resize_linear(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """cv2 INTER_LINEAR resize (A.Resize parity)."""
    import cv2

    return cv2.resize(img, (width, height), interpolation=cv2.INTER_LINEAR)


def eval_preprocess_image(path: str, size: Tuple[int, int]) -> np.ndarray:
    """Full host eval path: decode -> pad-to-AR -> resize. Returns uint8
    [H, W, 3]. Normalization happens on device.

    Parity quirk preserved: the reference builds the pad transform with
    ``aspect_ratio = WIDTH/HEIGHT`` (calculate_test_accuracy_image.py:224-236)
    while the transform itself compares against ``shape[0]/shape[1] = H/W``
    (keep_aspect_ratio.py:28-29) — i.e. the target ratio is transposed for
    non-square sizes. We pass w/h to match.
    """
    h, w = size
    img = load_rgb(path)
    img = pad_to_aspect_ratio(img, w / h)
    return resize_linear(img, h, w)


# ImageNet stats — reference main_image.py:432-434 default
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# OpenAI-CLIP stats — HF BlipImageProcessor defaults (BLIP-2 pipelines)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def blip_preprocess_image(path: str, size: int = 224) -> np.ndarray:
    """HF BlipImageProcessor host path: bicubic resize to (size, size),
    uint8 out (CLIP normalization happens on device).

    Resizes via PIL like HF image processors do — PIL's bicubic scales its
    filter support to the reduction factor (antialiased), where
    cv2.INTER_CUBIC samples a fixed 4x4 neighborhood and aliases on
    downscale; photos would diverge materially from the reference
    pipeline's pixels (tests/test_blip2_preprocess.py pins HF parity)."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB").resize((size, size), Image.BICUBIC)
        return np.asarray(im)


def normalize_on_device(x_uint8, mean=None, std=None, dtype=None):
    """uint8 NHWC -> normalized float NHWC. Call inside the jitted step so
    XLA fuses it with the first conv (A.Normalize parity:
    (x/255 - mean)/std)."""
    import jax.numpy as jnp

    mean = IMAGENET_MEAN if mean is None else np.asarray(mean, np.float32)
    std = IMAGENET_STD if std is None else np.asarray(std, np.float32)
    scale = (1.0 / (255.0 * std)).astype(np.float32)
    shift = (-mean / std).astype(np.float32)
    y = x_uint8.astype(jnp.float32) * jnp.asarray(scale) + jnp.asarray(shift)
    return y.astype(dtype) if dtype is not None else y
