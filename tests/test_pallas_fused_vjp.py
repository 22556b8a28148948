"""Trainable fused ADI evolution: forward + analytic in-kernel backward must
match jax.grad through the XLA scan path (interpret mode on CPU; validated on
TPU v5e at grad diff ≤5e-8)."""

import jax
import jax.numpy as jnp
import numpy as np

from cnn_pde_tpu.ops.pallas_fused_adi_vjp import fused_grayscale_diffusion
from cnn_pde_tpu.pde import GrayscaleDiffusion
from cnn_pde_tpu.pde.diffusion import _substep_times


def _setup(rng, key, H=8, steps=3, dt=0.01):
    layer = GrayscaleDiffusion(H, dt=dt, num_steps=steps)
    params, state = layer.init(key)
    params["alpha_base"] = params["alpha_base"] + jnp.asarray(
        rng.standard_normal((H, H)).astype(np.float32) * 0.3)
    params["alpha_time_coeff"] = jnp.asarray(
        rng.standard_normal((H, H)).astype(np.float32) * 0.2)
    params["beta_time_coeff"] = jnp.asarray(
        rng.standard_normal((H, H)).astype(np.float32) * 0.2)
    ts = tuple(map(tuple, np.asarray(_substep_times(dt, steps)).tolist()))
    return layer, params, state, ts


def test_fused_vjp_matches_xla_grads(rng, key):
    H, steps, dt = 8, 3, 0.01
    layer, params, state, ts = _setup(rng, key, H, steps, dt)
    u = jnp.asarray(rng.random((5, 1, H, H)).astype(np.float32))  # ragged
    gw = jnp.asarray(rng.random((5, H, H)).astype(np.float32))

    def loss_fused(u2, ab, atc, bb, btc):
        out = fused_grayscale_diffusion(u2, ab, atc, bb, btc, dt, 1.0, 1.0,
                                        steps, ts, 1e-6, 4, True)
        return jnp.sum(out * gw)

    def loss_xla(p, u):
        out, _ = layer.apply(p, state, u, None)
        return jnp.sum(out[:, 0] * gw)

    out_f = fused_grayscale_diffusion(
        u[:, 0], params["alpha_base"], params["alpha_time_coeff"],
        params["beta_base"], params["beta_time_coeff"],
        dt, 1.0, 1.0, steps, ts, 1e-6, 4, True)
    out_x, _ = layer.apply(params, state, u, None)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x[:, 0]),
                               rtol=1e-6, atol=1e-7)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
        u[:, 0], params["alpha_base"], params["alpha_time_coeff"],
        params["beta_base"], params["beta_time_coeff"])
    gx = jax.grad(loss_xla, argnums=(0, 1))(params, u)
    refs = [gx[1][:, 0], gx[0]["alpha_base"], gx[0]["alpha_time_coeff"],
            gx[0]["beta_base"], gx[0]["beta_time_coeff"]]
    for name, a, b in zip(["u", "ab", "atc", "bb", "btc"], gf, refs):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7,
            err_msg=f"fused-kernel grad mismatch for {name}")
