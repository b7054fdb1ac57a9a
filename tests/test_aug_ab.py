"""Augmentation A/B experiment (VERDICT r3 weak #5): the device pipeline
(data/augment.py, fused homography + photometric ops) is claimed
"capability-equivalent" to the reference's host albumentations stack
(main_image.py:444-468). This backs the claim empirically: train the same
tiny convnet on a learnable synthetic dataset under

  A) a host cv2 REPLICA of the albumentations train pipeline
     (rotate crop_border -> blur -> flips -> brightness/contrast ->
     sharpen -> perspective -> zoom, each at p=prob), and
  B) the device augment_batch,

same schedule, 3 seeds each; final clean-val accuracies must be high and
within noise of each other. Slow module.
"""

import math

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

H = W = 64
N_CLASSES = 4
PROB = 0.6


def _make_dataset(rng, n_per_class):
    """Class = dominant color of a filled rectangle on a noisy background
    — a signal every augmentation in the pipeline preserves."""
    colors = np.array([[200, 40, 40], [40, 200, 40], [40, 40, 200],
                       [200, 200, 40]], np.float32)
    xs, ys = [], []
    for c in range(N_CLASSES):
        for _ in range(n_per_class):
            img = rng.integers(0, 60, (H, W, 3)).astype(np.float32)
            y0, x0 = rng.integers(4, H // 2, 2)
            hh, ww = rng.integers(H // 4, H // 2, 2)
            jitter = rng.normal(0, 15, 3)
            img[y0:y0 + hh, x0:x0 + ww] = np.clip(colors[c] + jitter, 0, 255)
            xs.append(img.astype(np.uint8))
            ys.append(c)
    order = rng.permutation(len(xs))
    return (np.stack(xs)[order], np.asarray(ys, np.int32)[order])


# ---------------------------------------------------------------------------
# host cv2 replica of the albumentations train pipeline
# ---------------------------------------------------------------------------


def _host_augment_one(rng, img):
    x = img.astype(np.float32)
    # Rotate(limit=90, crop_border=True) — reuse the oracle replica
    if rng.random() < PROB:
        from tests.test_augment import _albu_rotate_crop_resize
        deg = rng.uniform(-90, 90)
        x = _albu_rotate_crop_resize(x, deg, H, W)
    # GaussianBlur(blur_limit 3..7)
    if rng.random() < PROB:
        k = int(rng.choice([3, 5, 7]))
        x = cv2.GaussianBlur(x, (k, k), 0)
    # VerticalFlip / HorizontalFlip
    if rng.random() < PROB:
        x = x[::-1]
    if rng.random() < PROB:
        x = x[:, ::-1]
    # RandomBrightnessContrast(+-0.2)
    if rng.random() < PROB:
        alpha = 1.0 + rng.uniform(-0.2, 0.2)
        beta = rng.uniform(-0.2, 0.2) * 255.0
        x = x * alpha + beta
    # Sharpen(alpha (0.2,0.5), lightness (0.5,1.0))
    if rng.random() < PROB:
        a = rng.uniform(0.2, 0.5)
        light = rng.uniform(0.5, 1.0)
        lap = np.array([[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]],
                       np.float32) / 8.0
        ident = np.zeros((3, 3), np.float32)
        ident[1, 1] = 1.0
        sharp = cv2.filter2D(x, -1, ident + lap * light,
                             borderType=cv2.BORDER_REPLICATE)
        x = (1 - a) * x + a * sharp
    # Perspective(scale (0.05, 0.1)) — mild projective warp
    if rng.random() < PROB:
        pv = rng.uniform(-0.1, 0.1, 2)
        m = np.eye(3, dtype=np.float32)
        m[2, 0] = pv[0] / W
        m[2, 1] = pv[1] / H
        x = cv2.warpPerspective(x, m, (W, H), flags=cv2.INTER_LINEAR)
    # ShiftScaleRotate(scale_limit 0.5, shift/rotate 0)
    if rng.random() < PROB:
        s = 1.0 + rng.uniform(-0.5, 0.5)
        m = cv2.getRotationMatrix2D((W / 2 - 0.5, H / 2 - 0.5), 0.0, s)
        x = cv2.warpAffine(x, m, (W, H), flags=cv2.INTER_LINEAR)
    return np.clip(x, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# tiny convnet + train loop
# ---------------------------------------------------------------------------


def _train_once(seed, train_x, train_y, val_x, val_y, augment):
    import jax
    import jax.numpy as jnp
    import optax

    from garbage_classification_rca_tpu.nn import core as nn

    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    params = {
        "c1": nn.init_conv(ks[0], 3, 3, 3, 16, bias=True),
        "c2": nn.init_conv(ks[1], 3, 3, 16, 32, bias=True),
        "head": nn.init_linear(ks[2], 32, N_CLASSES),
    }

    def forward(p, x_u8):
        x = x_u8.astype(jnp.float32) / 255.0
        h = jax.nn.relu(nn.conv2d(p["c1"], x, stride=2, padding=1))
        h = jax.nn.relu(nn.conv2d(p["c2"], h, stride=2, padding=1))
        h = jnp.mean(h, axis=(1, 2))
        return nn.linear(p["head"], h)

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            logits = forward(p, xb)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def acc_fn(params, x, y):
        return jnp.mean(jnp.argmax(forward(params, x), -1) == y)

    n = len(train_x)
    order_rng = np.random.default_rng(seed)
    bs = 16
    for step_i in range(150):
        idx = order_rng.choice(n, bs, replace=False)
        xb = augment(step_i, train_x[idx])
        params, opt_state, _ = step(params, opt_state, jnp.asarray(xb),
                                    jnp.asarray(train_y[idx]))
    return float(acc_fn(params, jnp.asarray(val_x), jnp.asarray(val_y)))


def test_device_aug_trains_like_host_albumentations_replica():
    import jax
    import jax.numpy as jnp

    from garbage_classification_rca_tpu.data.augment import augment_batch

    data_rng = np.random.default_rng(0)
    train_x, train_y = _make_dataset(data_rng, 16)   # 64 train
    val_x, val_y = _make_dataset(data_rng, 8)        # 32 val (clean)

    accs_host, accs_dev = [], []
    for seed in (1, 2, 3):
        host_rng = np.random.default_rng(1000 + seed)

        def host_aug(step_i, batch):
            return np.stack([_host_augment_one(host_rng, im)
                             for im in batch])

        def dev_aug(step_i, batch):
            key = jax.random.fold_in(jax.random.PRNGKey(2000 + seed),
                                     step_i)
            return np.asarray(augment_batch(key, jnp.asarray(batch), PROB))

        accs_host.append(_train_once(seed, train_x, train_y, val_x, val_y,
                                     host_aug))
        accs_dev.append(_train_once(seed, train_x, train_y, val_x, val_y,
                                    dev_aug))

    mh, md = float(np.mean(accs_host)), float(np.mean(accs_dev))
    print(f"host-albumentations-replica val accs: {accs_host} (mean {mh:.3f})")
    print(f"device-augment val accs:              {accs_dev} (mean {md:.3f})")
    # both must LEARN under augmentation, and agree within noise
    assert mh > 0.75, accs_host
    assert md > 0.75, accs_dev
    assert abs(mh - md) < 0.15, (accs_host, accs_dev)
