"""Trainable fused channel diffusion (P4/P5): forward + analytic in-kernel
backward (incl. channel-mixing adjoint and two-sided clamp mask) must match
jax.grad through the XLA scan path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_pde_tpu.ops.pallas_fused_channel_vjp import fused_channel_diffusion
from cnn_pde_tpu.pde import MixedChannelDiffusion
from cnn_pde_tpu.pde.diffusion import _substep_times


def _setup(rng, key, H=8, C=3, steps=3, dt=0.01, splitting="strang",
           cmax=2.0):
    layer = MixedChannelDiffusion(H, channels=C, dt=dt, num_steps=steps,
                                  splitting=splitting, clamp_max=cmax)
    params, state = layer.init(key)
    # exercise both clamp gates: raw values straddle eps and clamp_max
    params["alpha_base"] = jnp.asarray(
        rng.uniform(-0.5, cmax + 0.5, (C, H, H)).astype(np.float32))
    params["beta_base"] = jnp.asarray(
        rng.uniform(-0.5, cmax + 0.5, (C, H, H)).astype(np.float32))
    params["alpha_time_coeff"] = jnp.asarray(
        rng.standard_normal((C, H, H)).astype(np.float32) * 0.2)
    params["beta_time_coeff"] = jnp.asarray(
        rng.standard_normal((C, H, H)).astype(np.float32) * 0.2)
    ts = tuple(map(tuple, np.asarray(_substep_times(dt, steps),
                                     np.float64).tolist()))
    return layer, params, state, ts


@pytest.mark.parametrize("splitting", ["strang", "lie"])
def test_fused_channel_vjp_matches_xla_grads(rng, key, splitting):
    H, C, steps, dt, cmax = 8, 3, 3, 0.01, 2.0
    layer, params, state, ts = _setup(rng, key, H, C, steps, dt, splitting,
                                      cmax)
    u = jnp.asarray(rng.random((5, C, H, H)).astype(np.float32))  # ragged
    gw = jnp.asarray(rng.random((5, C, H, H)).astype(np.float32))

    names = ["alpha_base", "alpha_time_coeff", "beta_base",
             "beta_time_coeff", "channel_mixing"]

    def loss_fused(u2, ab, atc, bb, btc, mix):
        out = fused_channel_diffusion(u2, ab, atc, bb, btc, mix, dt, 1.0,
                                      1.0, steps, ts, splitting, 1e-6, cmax,
                                      4, True)
        return jnp.sum(out * gw)

    def loss_xla(p, u2):
        out, _ = layer.apply(p, state, u2, None)
        return jnp.sum(out * gw)

    args = (u,) + tuple(params[n] for n in names)
    out_f = fused_channel_diffusion(*args, dt, 1.0, 1.0, steps, ts,
                                    splitting, 1e-6, cmax, 4, True)
    out_x, _ = layer.apply(params, state, u, None)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=1e-5, atol=1e-6)

    gf = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    gx = jax.grad(loss_xla, argnums=(0, 1))(params, u)
    refs = [gx[1]] + [gx[0][n] for n in names]
    for name, a, b in zip(["u"] + names, gf, refs):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
            err_msg=f"fused channel-kernel grad mismatch for {name}")


@pytest.mark.parametrize("cls_kwargs", [
    dict(cls="gray"), dict(cls="channel")])
def test_fused_layer_branch_works_under_jit(rng, key, cls_kwargs):
    """Regression: the fused layer branches must build their static ts tuple
    from numpy, not the traced device array (TracerArrayConversionError)."""
    from cnn_pde_tpu.pde import GrayscaleDiffusion

    if cls_kwargs["cls"] == "gray":
        layer = GrayscaleDiffusion(8, dt=0.01, num_steps=2, fused=True,
                                   fused_tile_b=4)
        u = jnp.asarray(rng.random((3, 1, 8, 8)).astype(np.float32))
    else:
        layer = MixedChannelDiffusion(8, channels=3, dt=0.01, num_steps=2,
                                      fused=True, fused_train_tile_b=4)
        u = jnp.asarray(rng.random((3, 3, 8, 8)).astype(np.float32))
    layer.fused_interpret = True  # run the Pallas kernels off-TPU
    params, state = layer.init(key)
    out = jax.jit(lambda p, x: layer.apply(p, state, x, None)[0])(params, u)
    assert out.shape == u.shape and bool(jnp.all(jnp.isfinite(out)))
