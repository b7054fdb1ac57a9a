"""BLIP-2 image preprocessing parity vs HF BlipImageProcessor.

The reference feeds PIL images through AutoProcessor
(blip_2_training.py:55-79) — BlipImageProcessor resizes via PIL bicubic
(antialiased on downscale), then rescales 1/255 and normalizes with the
OpenAI-CLIP stats. Our host path (data/images.py::blip_preprocess_image,
uint8 out) + on-device normalize_clip must produce the same floats; a
cv2.INTER_CUBIC resize here diverges materially on downscale (review
finding, fixed).
"""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")


@pytest.mark.parametrize("hw", [(97, 183), (640, 480), (224, 224)])
def test_blip_preprocess_matches_hf(tmp_path, hw):
    from PIL import Image

    from garbage_classification_rca_tpu.cli.blip2_common import (
        normalize_clip)
    from garbage_classification_rca_tpu.data.images import (
        blip_preprocess_image)

    rng = np.random.default_rng(sum(hw))
    arr = rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
    p = tmp_path / "img.png"                      # lossless
    Image.fromarray(arr).save(p)

    proc = transformers.BlipImageProcessor(
        size={"height": 224, "width": 224})       # blip2-opt-2.7b config
    with Image.open(p) as im:
        want = proc(images=im.convert("RGB"),
                    return_tensors="np").pixel_values[0]   # [3, 224, 224]

    ours_u8 = blip_preprocess_image(str(p))
    got = np.asarray(normalize_clip(ours_u8[None], dtype=np.float32))[0]
    np.testing.assert_allclose(got.transpose(2, 0, 1), want, atol=1e-5,
                               err_msg=f"pixels diverge from HF at {hw}")
