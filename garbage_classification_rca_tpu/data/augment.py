"""Device-side train-time augmentation — jitted replacement for the
reference's host albumentations stack (main_image.py:444-468):

  Rotate -> [pad-AR + resize happen host-side] -> GaussianBlur -> VFlip ->
  HFlip -> RandomBrightnessContrast -> Sharpen -> Perspective ->
  ShiftScaleRotate(scale +-0.5), each applied independently with
  probability --prob_aug.

Design: all geometric ops compose into ONE homography per sample, applied
as a single bilinear gather (one pass over the image instead of four);
photometric ops are fused elementwise. Runs inside the train step on
uint8 NHWC, so augmentation overlaps nothing host-side and XLA fuses it
with normalization. Train-time only — numerics are capability-equivalent
to albumentations, not bit-identical (SURVEY §7 'cv2-exact augmentations':
acceptable for train; the eval path has no augmentation).

Parameter ranges mirror albumentations defaults: Rotate limit 90deg,
RandomBrightnessContrast +-0.2, Sharpen alpha (0.2, 0.5) lightness
(0.5, 1.0), Perspective scale (0.05, 0.1), ShiftScaleRotate scale_limit
0.5, GaussianBlur ksize 3..7.

Rotate reproduces the reference's crop_border=True (main_image.py:445-447):
the largest-inscribed-rectangle crop + resize is folded into the same
homography (``rotate_crop_matrix``), so a fired rotation zooms into the
valid region exactly like albumentations instead of leaving black
corners. Remaining (documented) order difference: the reference crops
BEFORE its host pad-AR+resize while this warp runs after them — the
framing distribution matches, the padding bars rotate with the content.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _rand(key, lo, hi, shape=()):
    return jax.random.uniform(key, shape, jnp.float32, lo, hi)


def inscribed_rect(theta, h, w):
    """Largest axis-aligned rectangle fully inside an h x w image rotated
    by ``theta`` (radians) — the closed form albumentations'
    Rotate._rotated_rect_with_max_area uses for crop_border=True
    (reference main_image.py:445-447). Returns traced (hr, wr)."""
    sa = jnp.abs(jnp.sin(theta))
    ca = jnp.abs(jnp.cos(theta))
    side_long = float(max(w, h))
    side_short = float(min(w, h))
    half = (side_short <= 2.0 * sa * ca * side_long) | (jnp.abs(sa - ca)
                                                        < 1e-10)
    x = 0.5 * side_short
    sa_s = jnp.maximum(sa, 1e-6)
    ca_s = jnp.maximum(ca, 1e-6)
    if w >= h:
        wr_h, hr_h = x / sa_s, x / ca_s
    else:
        wr_h, hr_h = x / ca_s, x / sa_s
    cos2a = ca * ca - sa * sa
    cos2a = jnp.where(jnp.abs(cos2a) < 1e-10, 1e-10, cos2a)
    wr_g = (w * ca - h * sa) / cos2a
    hr_g = (h * ca - w * sa) / cos2a
    hr = jnp.where(half, hr_h, hr_g)
    wr = jnp.where(half, wr_h, wr_g)
    # albumentations clamps its crop bounds to the canvas (max(0,.)/min(w,.))
    # — at large angles on non-square images the formula's rect is taller/
    # wider than the clipped rotated canvas, and the REAL reference crop
    # (black corners included) is the clamped one. Preserve that quirk.
    return jnp.minimum(hr, float(h)), jnp.minimum(wr, float(w))


def rotate_crop_matrix(theta, h, w):
    """Inverse-warp matrix (centered coords) for the reference's
    Rotate(crop_border=True): rotate by ``theta`` then crop the largest
    inscribed rectangle and resize it back to h x w. The crop+resize is
    folded in as an anisotropic scale (hr/h, wr/w) BEFORE the inverse
    rotation — equivalent to albumentations' rotate -> integer crop ->
    (downstream) Resize, up to its <=1 px int-truncated crop bounds
    (tests/test_augment.py pins it against a cv2 replica of the
    albumentations pipeline)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    hr, wr = inscribed_rect(theta, h, w)
    crop = jnp.diag(jnp.array([hr / h, wr / w, 1.0]))
    return rot @ crop


def solve_homography(src, dst):
    """Closed-form 8-dof homography from 4 point pairs — the linear
    system cv2.getPerspectiveTransform solves. ``src``/``dst``: [4, 2]
    (x, y). Returns the 3x3 H (H[2,2] = 1) mapping src -> dst
    homogeneously. Traced (jnp.linalg.solve on an 8x8 — noise next to
    the warp itself)."""
    src = src.astype(jnp.float64 if jax.config.jax_enable_x64
                     else jnp.float32)
    x, y = src[:, 0], src[:, 1]
    u, v = dst[:, 0], dst[:, 1]
    zero = jnp.zeros(4, src.dtype)
    one = jnp.ones(4, src.dtype)
    rows_u = jnp.stack([x, y, one, zero, zero, zero, -u * x, -u * y], 1)
    rows_v = jnp.stack([zero, zero, zero, x, y, one, -v * x, -v * y], 1)
    a = jnp.concatenate([rows_u, rows_v], 0)               # [8, 8]
    b = jnp.concatenate([u, v], 0)                         # [8]
    hvec = jnp.linalg.solve(a, b)
    return jnp.concatenate([hvec, jnp.ones(1, hvec.dtype)]).reshape(3, 3)


def perspective_params(key, h, w):
    """A.Perspective's exact corner sampling (albumentations
    geometric/transforms.py, defaults scale=(0.05, 0.1), keep_size=True,
    fit_output=False — the reference's config, main_image.py:457-459):
    per-corner jitter ~ |N(0, scale)| mod 0.32 pulls each source corner
    inward, the output size is the int-truncated max side length of the
    jittered quad. Returns (pts [4, 2] absolute (x, y) in tl/tr/br/bl
    order, max_width, max_height) — all traced.

    Faithfully skipped branches: _order_points is the identity here
    (jitter < 0.32 keeps left corners at x < 0.32w and right corners at
    x > 0.68w, ditto vertically), and the min-side-<2-px expansion loops
    can only trigger below ~7 px images."""
    k_s, k_j = jax.random.split(key)
    scale = _rand(k_s, 0.05, 0.1)
    jit = jnp.mod(jnp.abs(jax.random.normal(k_j, (4, 2)) * scale), 0.32)
    # corners in normalized (x, y): tl uses the raw jitter; tr mirrors x;
    # br mirrors both; bl mirrors y
    pts = jnp.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    sign = jnp.array([[1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0], [1.0, -1.0]])
    pts = (pts + sign * jit) * jnp.array([float(w), float(h)])
    tl, tr, br, bl = pts[0], pts[1], pts[2], pts[3]
    width_top = jnp.linalg.norm(tr - tl)
    width_bottom = jnp.linalg.norm(br - bl)
    mw = jnp.floor(jnp.maximum(width_top, width_bottom))   # int() trunc
    height_right = jnp.linalg.norm(tr - br)
    height_left = jnp.linalg.norm(tl - bl)
    mh = jnp.floor(jnp.maximum(height_right, height_left))
    return pts, mw, mh


def perspective_matrix(key, h, w):
    """Inverse-warp matrix (absolute (y, x) coords) of the reference's
    A.Perspective: warp the jittered source quad onto the
    [0, mw-1] x [0, mh-1] rectangle (cv2.getPerspectiveTransform), then
    keep_size-resize back to w x h. Both stages compose into this single
    matrix, so the runtime cost over the old 2-parameter approximation is
    one 8x8 solve per sample (VERDICT r4 weak #5)."""
    pts, mw, mh = perspective_params(key, h, w)
    dst = jnp.stack([jnp.array([0.0, 1.0, 1.0, 0.0]) * (mw - 1.0),
                     jnp.array([0.0, 0.0, 1.0, 1.0]) * (mh - 1.0)], 1)
    # inverse map: solve rect -> quad directly (homographies invert by
    # swapping the correspondence)
    p_inv = solve_homography(dst, pts)                     # (x, y) conv
    # keep_size resize back to (w, h): output px -> warped px, cv2's
    # half-pixel-center convention x_w = (x + 0.5) * mw / w - 0.5
    sx, sy = mw / float(w), mh / float(h)
    resize = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                        [0.0, 0.0, 1.0]])
    resize = resize.at[0, 0].set(sx).at[0, 2].set(0.5 * sx - 0.5)
    resize = resize.at[1, 1].set(sy).at[1, 2].set(0.5 * sy - 0.5)
    m_xy = p_inv @ resize
    swap = jnp.array([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    return swap @ m_xy @ swap                              # (y, x) conv


def _homography(keys, h, w, p):
    """Compose rotate / zoom / perspective / flips into a 3x3 matrix that
    maps OUTPUT pixel coords -> SOURCE coords (inverse warp)."""
    k_rot, k_rotp, k_scale, k_scalep, k_persp, k_perspp, k_vf, k_hf = keys
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0

    def maybe(kp, mat):
        return jnp.where(jax.random.uniform(kp) < p, mat, jnp.eye(3))

    # rotation (A.Rotate limit=90 crop_border=True, main_image.py:445-447):
    # inverse rotation composed with the inscribed-rect crop scale, so a
    # fired rotation shows exactly the region the reference keeps (no
    # zero corners) instead of rotating in place with black borders
    theta = _rand(k_rot, -math.pi / 2, math.pi / 2)
    rot = maybe(k_rotp, rotate_crop_matrix(theta, h, w))

    # zoom (ShiftScaleRotate scale_limit=0.5): source = out / scale
    scale = 1.0 + _rand(k_scale, -0.5, 0.5)
    zoom = jnp.diag(jnp.array([1.0, 1.0, 1.0]) / jnp.array([scale, scale, 1.0]))
    zoom = maybe(k_scalep, zoom)

    # flips (sign change around center)
    vf = jnp.where(jax.random.uniform(k_vf) < p, -1.0, 1.0)
    hf = jnp.where(jax.random.uniform(k_hf) < p, -1.0, 1.0)
    flip = jnp.diag(jnp.array([vf, hf, 1.0]))

    center = jnp.array([[1.0, 0.0, cy], [0.0, 1.0, cx], [0.0, 0.0, 1.0]])
    uncenter = jnp.array([[1.0, 0.0, -cy], [0.0, 1.0, -cx], [0.0, 0.0, 1.0]])

    # A.Perspective (scale (0.05, 0.1), keep_size) — the exact 4-corner
    # jitter + getPerspectiveTransform homography + resize-back, in
    # closed form (perspective_matrix; oracle-pinned in
    # tests/test_augment.py). Built in absolute (y, x) coords, so it is
    # conjugated into the centered frame the rest of the chain uses.
    persp = maybe(k_perspp,
                  uncenter @ perspective_matrix(k_persp, h, w) @ center)

    return center @ persp @ rot @ zoom @ flip @ uncenter


def _warp_bilinear(img_f32, mat, h, w):
    """Inverse-warp one [H, W, 3] image with zero border."""
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(gy)
    src = jnp.einsum("ij,jhw->ihw", mat, jnp.stack([gy, gx, ones]))
    sy = src[0] / src[2]
    sx = src[1] / src[2]

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = sy - y0
    wx = sx - x0

    def tap(yy, xx):
        inside = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        v = img_f32[yc, xc]
        return jnp.where(inside[..., None], v, 0.0)

    out = (tap(y0, x0) * ((1 - wy) * (1 - wx))[..., None]
           + tap(y0, x0 + 1) * ((1 - wy) * wx)[..., None]
           + tap(y0 + 1, x0) * (wy * (1 - wx))[..., None]
           + tap(y0 + 1, x0 + 1) * (wy * wx)[..., None])
    return out


def _sharpen_kernels():
    """Built lazily (they become jit constants anyway): module-level jnp
    arrays would initialize the JAX backend as an import side effect,
    racing GC_RCA_PLATFORM pinning / jax.distributed.initialize for
    anyone importing this module before configuring JAX."""
    ident = jnp.zeros((3, 3)).at[1, 1].set(1.0)
    laplace = jnp.array([[-1., -1., -1.], [-1., 8., -1.],
                         [-1., -1., -1.]]) / 8.0
    return ident, laplace


def _dwconv(img, kernel):
    """Depthwise KxK with EDGE padding on [H, W, 3] fp32 (cv2 borders
    replicate/reflect rather than zero — zero padding would darken the
    image rim on every blur/sharpen application)."""
    r = kernel.shape[0] // 2
    padded = jnp.pad(img, ((r, r), (r, r), (0, 0)), mode="edge")
    x = padded.transpose(2, 0, 1)[:, None]         # [3, 1, H+2r, W+2r]
    k = kernel[None, None]
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y[:, 0].transpose(1, 2, 0)


def _gauss_kernel7(sigma):
    """7x7 gaussian with traced sigma — covers albumentations
    GaussianBlur blur_limit (3, 7): sigma 0.8 (ksize-3 equivalent, outer
    taps ~0) through 1.4 (ksize-7)."""
    d = jnp.arange(-3.0, 4.0)
    g = jnp.exp(-(d ** 2) / (2.0 * sigma ** 2))
    k = g[:, None] * g[None, :]
    return k / jnp.sum(k)


def _augment_one(key, img_u8, p: float):
    h, w = img_u8.shape[0], img_u8.shape[1]
    keys = jax.random.split(key, 16)
    x = img_u8.astype(jnp.float32)

    # single fused geometric warp
    mat = _homography(tuple(keys[:8]), h, w, p)
    x = _warp_bilinear(x, mat, h, w)

    # gaussian blur, sigma sampled over the ksize 3..7 equivalent range
    sigma = _rand(keys[15], 0.8, 1.4)
    blur = _dwconv(x, _gauss_kernel7(sigma))
    x = jnp.where(jax.random.uniform(keys[8]) < p, blur, x)

    # brightness / contrast (+-0.2 each)
    alpha = 1.0 + _rand(keys[9], -0.2, 0.2)
    beta = _rand(keys[10], -0.2, 0.2) * 255.0
    bc = x * alpha + beta
    x = jnp.where(jax.random.uniform(keys[11]) < p, bc, x)

    # sharpen (unsharp: blend identity with edge-enhanced)
    s_alpha = _rand(keys[12], 0.2, 0.5)
    light = _rand(keys[13], 0.5, 1.0)
    ident, laplace = _sharpen_kernels()
    sharp = _dwconv(x, ident + laplace * light)
    sh = (1 - s_alpha) * x + s_alpha * sharp
    x = jnp.where(jax.random.uniform(keys[14]) < p, sh, x)

    return jnp.clip(x, 0.0, 255.0).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("prob",))
def augment_batch(key, images_u8: jnp.ndarray, prob: float) -> jnp.ndarray:
    """[B, H, W, 3] uint8 -> augmented uint8 (per-sample independent RNG)."""
    keys = jax.random.split(key, images_u8.shape[0])
    return jax.vmap(lambda k, im: _augment_one(k, im, prob))(keys, images_u8)
