"""On-device batch augmentation (the sideband-A transforms, TPU-first).

The reference augments per-image on CPU DataLoader workers (torchvision
transforms, e.g. cifar10.py:372-380).  Here every augmentation is a pure JAX
function vmapped over the batch and executed *inside* the jit'd train step, so
it fuses with the forward pass and rides the same HBM-resident tensors —
no host round-trip.

Images are NCHW float32 in [0, 1] pre-normalization (ToTensor convention);
``normalize`` applies (x − mean)/std per channel at the end, matching the
torchvision pipelines' transform order.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = ["AugmentSpec", "build_augment_fn", "build_normalize_fn"]


def _tri(coords, n):
    """Bilinear tap weights tri(d)=max(0, 1−|d|) of fractional source
    coordinates against n integer taps (shared by the 2-D warp and the
    separable resize-crop paths)."""
    taps = jnp.arange(n, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., None] - taps))


def _bilinear_sample(img, coords_y, coords_x):
    """Bilinear sampling of a (C, H, W) image at (H', W') coordinate grids
    with zero fill outside — TPU-first: instead of a gather (map_coordinates
    lowers to per-pixel gathers, which are slow on TPU), exploit that
    bilinear weights FACTOR per axis: weight((i,j)→(k,l)) = tri(cy[i,j]−k) ·
    tri(cx[i,j]−l) with tri(d)=max(0, 1−|d|).  The warp is then two small
    einsums that ride the MXU; out-of-range taps drop weight, which is
    exactly the cval=0 convention."""
    C, H, W = img.shape
    wy = _tri(coords_y, H)                                   # (H', W', H)
    wx = _tri(coords_x, W)                                   # (H', W', W)
    # HIGH (bf16x3) here, not HIGHEST: the bilinear warp only feeds the
    # random rotate/translate augmentations, where ~1e-4 pixel drift is far
    # below the augmentation's own randomness — and it is ~28% faster on
    # the chain (0.40 → 0.29 ms, PERF.md).  The crop/resize samplers keep
    # HIGHEST for their exactness guarantees.
    t = jnp.einsum("ijk,ckl->cijl", wy, img,
                   precision=jax.lax.Precision.HIGH)
    return jnp.einsum("cijl,ijl->cij", t, wx,
                      precision=jax.lax.Precision.HIGH)


def _affine_warp(img, inv_matrix):
    """Apply the inverse-affine (2×3) map to a (C, H, W) image, bilinear,
    zero fill. Coordinates are centered (torch convention)."""
    C, H, W = img.shape
    ys = jnp.arange(H, dtype=jnp.float32) - (H - 1) / 2.0
    xs = jnp.arange(W, dtype=jnp.float32) - (W - 1) / 2.0
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    src_x = inv_matrix[0, 0] * xx + inv_matrix[0, 1] * yy + inv_matrix[0, 2]
    src_y = inv_matrix[1, 0] * xx + inv_matrix[1, 1] * yy + inv_matrix[1, 2]
    coords_y = src_y + (H - 1) / 2.0
    coords_x = src_x + (W - 1) / 2.0
    return _bilinear_sample(img, coords_y, coords_x)


def _rotate(rng, img, degrees):
    angle = jax.random.uniform(rng, (), minval=-degrees, maxval=degrees)
    rad = angle * math.pi / 180.0
    c, s = jnp.cos(rad), jnp.sin(rad)
    inv = jnp.array([[c, s, 0.0], [-s, c, 0.0]])
    return _affine_warp(img, inv)


def _translate(rng, img, max_frac):
    _, H, W = img.shape
    tx = jax.random.uniform(rng, (), minval=-max_frac, maxval=max_frac) * W
    ty = jax.random.uniform(jax.random.fold_in(rng, 1), (),
                            minval=-max_frac, maxval=max_frac) * H
    inv = jnp.array([[1.0, 0.0, -tx], [0.0, 1.0, -ty]])
    return _affine_warp(img, inv)


def _hflip(rng, img, p=0.5):
    flip = jax.random.bernoulli(rng, p)
    return jnp.where(flip, img[:, :, ::-1], img)


def _resize_crop(rng, img, resize_to):
    """Resize (bilinear) to resize_to then random-crop back to the original
    size — torchvision Resize(R)+RandomCrop(S) (tiny_imagenet.py:524-525),
    done as ONE affine sampling pass: output pixel (i,j) reads the input at
    ((i+oy)·S/R, (j+ox)·S/R)."""
    C, H, W = img.shape
    scale = H / resize_to
    ky, kx = jax.random.split(rng)
    oy = jax.random.randint(ky, (), 0, resize_to - H + 1).astype(jnp.float32)
    ox = jax.random.randint(kx, (), 0, resize_to - W + 1).astype(jnp.float32)
    ys = (jnp.arange(H, dtype=jnp.float32) + oy) * scale
    xs = (jnp.arange(W, dtype=jnp.float32) + ox) * scale
    # the grid is separable (ys ⊗ xs): 1-D tri weights per axis, two matmuls
    ay = _tri(ys, H)                                       # (H, H) src taps
    ax = _tri(xs, W)                                       # (W, W)
    return jnp.einsum("ik,ckl,jl->cij", ay, img, ax,
                      precision=jax.lax.Precision.HIGHEST)


def _random_crop_pad(rng, img, padding):
    """RandomCrop(size, padding) — zero-pad then crop at a random offset.
    With integer offsets the tri weights are exact one-hot rows and
    out-of-range taps contribute zero (≡ the zero padding), so the crop is
    the same separable two-matmul sampling as the warps — bit-exact vs the
    vmapped dynamic_slice it replaces (a batched gather) and 3.3× faster."""
    C, H, W = img.shape
    ky, kx = jax.random.split(rng)
    oy = jax.random.randint(ky, (), 0, 2 * padding + 1).astype(jnp.float32)
    ox = jax.random.randint(kx, (), 0, 2 * padding + 1).astype(jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32) + oy - padding
    xs = jnp.arange(W, dtype=jnp.float32) + ox - padding
    return jnp.einsum("ik,ckl,jl->cij", _tri(ys, H), img, _tri(xs, W),
                      precision=jax.lax.Precision.HIGHEST)


def _rgb_to_hsv(img):
    r, g, b = img[0], img[1], img[2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta == 0, 0.0, (h / 6.0) % 1.0)
    return jnp.stack([h, s, v])


def _hsv_to_rgb(img):
    """Arithmetic (branch-free) HSV→RGB: channel(n) = v − v·s·clamp(min(k,
    4−k), 0, 1) with k = (n + 6h) mod 6 — identical to the 6-sector
    piecewise form but pure VPU math (the jnp.choose formulation lowered to
    per-pixel gathers, which dominated the whole augmentation pipeline on
    TPU)."""
    h, s, v = img[0], img[1], img[2]

    def channel(n):
        k = jnp.mod(n + h * 6.0, 6.0)
        return v - v * s * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    return jnp.stack([channel(5.0), channel(3.0), channel(1.0)])


def _color_jitter(rng, img, brightness, contrast, saturation, hue):
    ks = jax.random.split(rng, 4)
    if brightness:
        f = jax.random.uniform(ks[0], (), minval=1 - brightness, maxval=1 + brightness)
        img = jnp.clip(img * f, 0.0, 1.0)
    if contrast:
        f = jax.random.uniform(ks[1], (), minval=1 - contrast, maxval=1 + contrast)
        # torchvision adjust_contrast pivots on the LUMINANCE mean
        # (mean of 0.299r+0.587g+0.114b), not the unweighted channel mean
        if img.shape[0] == 3:
            pivot = jnp.mean(0.299 * img[0] + 0.587 * img[1] + 0.114 * img[2])
        else:
            pivot = jnp.mean(img)
        img = jnp.clip((img - pivot) * f + pivot, 0.0, 1.0)
    if saturation and img.shape[0] == 3:
        f = jax.random.uniform(ks[2], (), minval=1 - saturation, maxval=1 + saturation)
        gray = (0.299 * img[0] + 0.587 * img[1] + 0.114 * img[2])[None]
        img = jnp.clip(gray + (img - gray) * f, 0.0, 1.0)
    if hue and img.shape[0] == 3:
        dh = jax.random.uniform(ks[3], (), minval=-hue, maxval=hue)
        hsv = _rgb_to_hsv(img)
        hsv = hsv.at[0].set((hsv[0] + dh) % 1.0)
        img = jnp.clip(_hsv_to_rgb(hsv), 0.0, 1.0)
    return img


def _random_erasing(rng, img, p=0.1, scale=(0.02, 0.33), ratio=(0.3, 3.3)):
    """torch RandomErasing (single clamped attempt), value 0."""
    C, H, W = img.shape
    ks = jax.random.split(rng, 5)
    apply = jax.random.bernoulli(ks[0], p)
    area = H * W * jax.random.uniform(ks[1], (), minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(
        ks[2], (), minval=math.log(ratio[0]), maxval=math.log(ratio[1]))
    r = jnp.exp(log_ratio)
    h = jnp.clip(jnp.round(jnp.sqrt(area * r)), 1, H).astype(jnp.int32)
    w = jnp.clip(jnp.round(jnp.sqrt(area / r)), 1, W).astype(jnp.int32)
    oy = jax.random.randint(ks[3], (), 0, H)
    ox = jax.random.randint(ks[4], (), 0, W)
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    mask = (yy >= oy) & (yy < oy + h) & (xx >= ox) & (xx < ox + w)
    erased = jnp.where(mask[None], 0.0, img)
    return jnp.where(apply, erased, img)


class AugmentSpec:
    """Declarative augmentation pipeline (mirrors the torchvision Compose
    chains per preset — D1-D4 in SURVEY.md §2.4)."""

    def __init__(self, *, rotation=0.0, translate=0.0, hflip=0.0,
                 crop_padding=0, resize_crop=0, brightness=0.0, contrast=0.0,
                 saturation=0.0, hue=0.0, erasing_p=0.0,
                 mean: Optional[Sequence[float]] = None,
                 std: Optional[Sequence[float]] = None):
        self.rotation = rotation
        self.translate = translate
        self.resize_crop = resize_crop  # Resize(R)+RandomCrop(original)
        self.hflip = hflip
        self.crop_padding = crop_padding
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue
        self.erasing_p = erasing_p
        self.mean = mean
        self.std = std


def build_augment_fn(spec: AugmentSpec) -> Callable:
    """Returns augment(rng, batch NCHW in [0,1]) -> normalized batch, to be
    called inside the jit'd train step."""

    def augment_one(rng, img):
        ks = jax.random.split(rng, 6)
        if spec.resize_crop:
            img = _resize_crop(jax.random.fold_in(ks[0], 7), img,
                               spec.resize_crop)
        if spec.crop_padding:
            img = _random_crop_pad(ks[0], img, spec.crop_padding)
        if spec.hflip:
            img = _hflip(ks[1], img, spec.hflip)
        if spec.rotation and spec.translate:
            # compose rotation∘translation into ONE inverse-affine warp —
            # map_coordinates gathers are the dominant augmentation cost,
            # so one sampling pass instead of two
            _, H, W = img.shape
            angle = jax.random.uniform(ks[2], (), minval=-spec.rotation,
                                       maxval=spec.rotation)
            rad = angle * math.pi / 180.0
            c, s = jnp.cos(rad), jnp.sin(rad)
            tx = jax.random.uniform(ks[3], (), minval=-spec.translate,
                                    maxval=spec.translate) * W
            ty = jax.random.uniform(jax.random.fold_in(ks[3], 1), (),
                                    minval=-spec.translate,
                                    maxval=spec.translate) * H
            # forward map: translate(rotate(x)); inverse: rotate⁻¹∘translate⁻¹
            inv = jnp.array([[c, s, -(c * tx + s * ty)],
                             [-s, c, -(-s * tx + c * ty)]])
            img = _affine_warp(img, inv)
        elif spec.rotation:
            img = _rotate(ks[2], img, spec.rotation)
        elif spec.translate:
            img = _translate(ks[3], img, spec.translate)
        if spec.brightness or spec.contrast or spec.saturation or spec.hue:
            img = _color_jitter(ks[4], img, spec.brightness, spec.contrast,
                                spec.saturation, spec.hue)
        return img, ks[5]

    def augment(rng, batch):
        rngs = jax.random.split(rng, batch.shape[0])
        out, ks = jax.vmap(augment_one)(rngs, batch)
        if spec.mean is not None:
            mean = jnp.asarray(spec.mean, jnp.float32)[:, None, None]
            std = jnp.asarray(spec.std, jnp.float32)[:, None, None]
            out = (out - mean) / std
        if spec.erasing_p:  # torchvision applies erasing after Normalize
            out = jax.vmap(partial(_random_erasing, p=spec.erasing_p))(ks, out)
        return out

    return augment


def build_normalize_fn(mean, std):
    mean = jnp.asarray(mean, jnp.float32)[:, None, None]
    std = jnp.asarray(std, jnp.float32)[:, None, None]

    def normalize(batch):
        return (batch - mean) / std

    return normalize
