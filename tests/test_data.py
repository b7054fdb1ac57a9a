"""Data layer: manifest walk, text preprocessing parity, pad-to-AR geometry,
tokenizers, batching (SURVEY.md §4 gap-fill tests)."""

import numpy as np
import pytest

from garbage_classification_rca_tpu.data.manifest import (
    pre_process_text, build_manifest, find_classes)
from garbage_classification_rca_tpu.data.images import (
    pad_to_aspect_ratio, eval_preprocess_image, normalize_on_device)
from garbage_classification_rca_tpu.data.pipeline import ImageTextBatcher, batch_indices
from garbage_classification_rca_tpu.data.sampler import imbalanced_sample_order
from garbage_classification_rca_tpu.data.tokenizer import (
    WordPieceTokenizer, HashTokenizer, get_tokenizer)


@pytest.mark.parametrize("raw,want", [
    ("Water_Bottle_12", "water bottle"),
    ("greasy-pizza-box_2", "greasypizzabox"),   # '-' is a symbol, stripped
    ("tin_can_99", "tin can"),
    ("ALL_CAPS_7x", "all caps x"),
    ("123", ""),
])
def test_pre_process_text_parity(raw, want):
    # reference CustomImageTextFolder.py:29-42
    assert pre_process_text(raw) == want


def test_manifest_walk(tiny_dataset):
    m = build_manifest(str(tiny_dataset))
    assert m.classes == ["black", "blue", "green", "ttr"]
    assert len(m) == 12
    assert m.class_counts() == [3, 3, 3, 3]
    np.testing.assert_allclose(m.class_weights(), [1.0] * 4)
    s = m.samples[0]
    assert s.label == 0 and s.text  # filename-derived text non-empty


def test_manifest_missing_class_raises(tmp_path):
    (tmp_path / "black").mkdir()
    with pytest.raises(FileNotFoundError):
        build_manifest(str(tmp_path))


def test_pad_to_ar_square():
    # reference pads WIDTH in the H/W < target branch, by int(target*W) - H
    # (keep_aspect_ratio.py:36-41; its width/height names are swapped)
    img = np.ones((40, 80, 3), np.uint8)
    out = pad_to_aspect_ratio(img, 1.0)      # wants H/W == 1
    assert out.shape == (40, 120, 3)         # pad = int(1*80)-40 = 40 on W
    # zero padding split evenly
    assert out[:, :20].sum() == 0 and out[:, -20:].sum() == 0
    assert out[:, 20:100].sum() == img.sum()


def test_pad_to_ar_tall_pads_height():
    # H/W > target branch pads HEIGHT by int(H/target) - W
    # (keep_aspect_ratio.py:43-48)
    img = np.ones((80, 40, 3), np.uint8)
    out = pad_to_aspect_ratio(img, 1.0)
    assert out.shape == (120, 40, 3)
    assert out[:20].sum() == 0 and out[-20:].sum() == 0


def test_pad_to_ar_odd_pixel_parity():
    # int(pad/2) both sides: odd pad loses one pixel (reference quirk,
    # keep_aspect_ratio.py:40-48)
    img = np.ones((41, 80, 3), np.uint8)
    out = pad_to_aspect_ratio(img, 1.0)
    assert out.shape == (41, 118, 3)         # pad=int(80)-41=39 -> 2*19 on W


def _reference_pad_to_ar(img, target_aspect_ratio):
    """Line-for-line executable replica of keep_aspect_ratio.py:24-50
    (the oracle these tests pin against)."""
    def add_margin(a, top, right, bottom, left):
        return np.pad(a, ((top, bottom), (left, right), (0, 0)),
                      mode="constant")

    size = img.shape
    current_aspect_ratio = size[0] / size[1]
    original_width = size[0]      # reference's swapped names, kept verbatim
    original_height = size[1]
    new_img = img
    if current_aspect_ratio < target_aspect_ratio:
        target_width = int(target_aspect_ratio * original_height)
        pad_amount_pixels = target_width - original_width
        new_img = add_margin(img, 0, int(pad_amount_pixels / 2),
                             0, int(pad_amount_pixels / 2))
    if current_aspect_ratio > target_aspect_ratio:
        target_height = int(original_width / target_aspect_ratio)
        pad_amount_pixels = target_height - original_height
        new_img = add_margin(img, int(pad_amount_pixels / 2), 0,
                             int(pad_amount_pixels / 2), 0)
    return new_img


def test_pad_to_ar_matches_reference_oracle():
    rng = np.random.default_rng(7)
    shapes = [(40, 80), (80, 40), (33, 47), (47, 33), (100, 40), (40, 120),
              (224, 224), (17, 201), (201, 17)]
    ars = [1.0, 480 / 480, 256 / 224, 224 / 256, 0.6, 1.7]
    for h, w in shapes:
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        for ar in ars:
            want = _reference_pad_to_ar(img, ar)
            got = pad_to_aspect_ratio(img, ar)
            assert got.shape == want.shape, ((h, w), ar, got.shape, want.shape)
            np.testing.assert_array_equal(got, want)


def test_eval_preprocess_shapes(tiny_dataset):
    m = build_manifest(str(tiny_dataset))
    img = eval_preprocess_image(m.samples[0].image_path, (224, 224))
    assert img.shape == (224, 224, 3) and img.dtype == np.uint8
    img2 = eval_preprocess_image(m.samples[0].image_path, (224, 256))
    assert img2.shape == (224, 256, 3)


def test_normalize_on_device_matches_albumentations_math():
    import jax.numpy as jnp
    x = np.random.default_rng(0).integers(0, 256, (2, 4, 4, 3)).astype(np.uint8)
    got = np.asarray(normalize_on_device(jnp.asarray(x)))
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    want = (x.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_wordpiece_tokenizer():
    vocab = {t: i for i, t in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "water", "bottle", "tin",
         "can", "##s", "bat", "##tery"])}
    tok = WordPieceTokenizer(vocab)
    ids, mask = tok.encode_one("water bottles", 16)
    assert ids == [2, 4, 5, 8, 3]            # CLS water bottle ##s SEP
    assert mask == [1] * 5
    enc = tok.encode_batch(["tin can", "battery"], 8)
    assert enc.input_ids.shape == (2, 8)
    assert enc.input_ids[0].tolist()[:4] == [2, 6, 7, 3]
    assert enc.input_ids[1].tolist()[:4] == [2, 9, 10, 3]
    assert enc.attention_mask.sum(1).tolist() == [4, 4]


def test_hash_tokenizer_deterministic():
    tok = get_tokenizer("distilbert")
    assert isinstance(tok, HashTokenizer)
    a = tok.encode_batch(["water bottle"], 8).input_ids
    b = tok.encode_batch(["water bottle"], 8).input_ids
    np.testing.assert_array_equal(a, b)
    assert a[0, 0] == 101  # CLS


def test_batcher_fixed_shapes_and_tail_mask(tiny_dataset):
    m = build_manifest(str(tiny_dataset))
    tok = get_tokenizer("distilbert")
    b = ImageTextBatcher(m, (64, 64), tokenizer=tok, seq_len=16, workers=2)
    batches = list(b.iter_batches(8, shuffle=False))
    b.close()
    assert len(batches) == 2
    for batch in batches:
        assert batch["image"].shape == (8, 64, 64, 3)
        assert batch["input_ids"].shape == (8, 16)
    # tail: 12 samples -> second batch has 4 valid
    assert batches[1]["valid"].sum() == 4
    assert batches[0]["valid"].sum() == 8


def test_imbalanced_sampler_rebalances(tiny_dataset):
    m = build_manifest(str(tiny_dataset))
    # skew: drop most of class 0 from a copy of samples
    import copy
    m2 = copy.copy(m)
    m2.samples = [s for s in m.samples if s.label != 0] + \
        [s for s in m.samples if s.label == 0][:1]
    order = imbalanced_sample_order(m2, seed=0, num_samples=4000)
    labels = np.asarray([m2.samples[i].label for i in order])
    counts = np.bincount(labels, minlength=4)
    # with replacement + inverse-frequency weights all classes ~uniform
    assert counts.min() > 0.8 * counts.max()


def test_batch_indices_cover_all():
    plans = batch_indices(13, 4, shuffle=True, seed=1)
    got = np.sort(np.concatenate(plans))
    np.testing.assert_array_equal(got, np.arange(13))


def test_abandoned_iterator_does_not_leak_producer_threads(tiny_dataset):
    """Early-exit consumers (bench smoke, eval early break) must not pin
    producer threads blocked in q.put() for the process lifetime."""
    import threading
    import time

    from garbage_classification_rca_tpu.data.pipeline import ImageTextBatcher

    m = build_manifest(str(tiny_dataset))
    b = ImageTextBatcher(m, (16, 16), workers=2)
    for _ in b.iter_batches(4):  # warm the persistent decode pool
        pass
    time.sleep(0.2)
    n0 = threading.active_count()
    for _ in range(20):
        it = b.iter_batches(4, prefetch=1)
        next(it)
        it.close()
    time.sleep(1.5)
    assert threading.active_count() <= n0 + 1
    # full iteration afterwards still yields every sample exactly once
    got = sum(int(bb["valid"].sum()) for bb in b.iter_batches(4))
    assert got == len(m)
    b.close()


def test_decode_error_raises_not_truncates(tiny_dataset):
    """A corrupt/vanished image must FAIL the epoch, not end it early —
    a partial eval would report deflated accuracy with exit code 0."""
    import copy

    import pytest

    from garbage_classification_rca_tpu.data.pipeline import ImageTextBatcher

    m = build_manifest(str(tiny_dataset))
    import dataclasses

    m2 = copy.copy(m)
    m2.samples = list(m.samples)
    m2.samples[5] = dataclasses.replace(
        m2.samples[5],
        image_path=str(tiny_dataset / "black" / "does_not_exist.jpg"))
    b = ImageTextBatcher(m2, (16, 16), workers=2)
    with pytest.raises(RuntimeError, match="input pipeline failed"):
        for _ in b.iter_batches(4):
            pass
    b.close()


def test_device_prefetch_depth_lookahead():
    """--prefetch_depth plumbing: depth N pulls N host batches before the
    first yield (lookahead window); depth<=0 disables pull-ahead entirely
    (pure passthrough — still device_puts, never reads ahead, ADVICE r3)."""
    from garbage_classification_rca_tpu.data.pipeline import device_prefetch

    pulled = []

    def src(n):
        for i in range(n):
            pulled.append(i)
            yield {"x": np.full((2,), i)}

    it = device_prefetch(src(5), depth=3)
    first = next(it)
    assert int(np.asarray(first["x"])[0]) == 0
    assert len(pulled) == 4            # 3 prefetched + 1 refill after yield
    rest = list(it)
    assert [int(np.asarray(b["x"])[0]) for b in rest] == [1, 2, 3, 4]

    pulled.clear()
    it = device_prefetch(src(3), depth=0)
    first = next(it)
    assert int(np.asarray(first["x"])[0]) == 0
    assert pulled == [0]               # no pull-ahead at depth 0
    assert len(list(it)) == 2


def test_resolve_param_dtype_policy():
    import jax.numpy as jnp

    from garbage_classification_rca_tpu.config import args_parser
    from garbage_classification_rca_tpu.utils.dtype import resolve_param_dtype

    a = args_parser(["--dataset_folder_name=x"])          # empty default
    assert resolve_param_dtype(a, "float32") == jnp.float32
    assert resolve_param_dtype(a, a.compute_dtype) == jnp.bfloat16
    a = args_parser(["--dataset_folder_name=x", "--param_dtype=bfloat16"])
    assert resolve_param_dtype(a, "float32") == jnp.bfloat16
    a = args_parser(["--dataset_folder_name=x", "--param_dtype=float32",
                     "--compute_dtype=bfloat16"])
    assert resolve_param_dtype(a, a.compute_dtype) == jnp.float32
