"""Fused whole-layer ADI kernel: interpret-mode parity on CPU (the real kernel
was validated on TPU v5e: 3e-7 max diff vs the XLA layer, ~3× faster fwd)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_pde_tpu.ops.pallas_fused_adi import fused_grayscale_diffusion_fwd
from cnn_pde_tpu.pde import GrayscaleDiffusion
from cnn_pde_tpu.pde.diffusion import _substep_times


def test_fused_matches_layer_interpret(rng, key):
    H = W = 8
    steps = 3
    dt = 0.01
    layer = GrayscaleDiffusion(H, dt=dt, num_steps=steps)
    params, state = layer.init(key)
    params["alpha_base"] = params["alpha_base"] + jnp.asarray(
        rng.standard_normal((H, W)).astype(np.float32) * 0.3)
    params["alpha_time_coeff"] = jnp.asarray(
        rng.standard_normal((H, W)).astype(np.float32) * 0.1)
    u = jnp.asarray(rng.random((4, 1, H, W)).astype(np.float32))
    ref, _ = layer(params, state, u)
    ts = np.asarray(_substep_times(dt, steps))
    out = fused_grayscale_diffusion_fwd(
        u[:, 0], params["alpha_base"], params["alpha_time_coeff"],
        params["beta_base"], params["beta_time_coeff"],
        dt=dt, dx=1.0, dy=1.0, num_steps=steps, ts=ts, tile_b=4,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[:, 0]),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("splitting,steps", [("strang", 5), ("lie", 4)])
def test_channel_fused_matches_layer_interpret(rng, key, splitting, steps):
    from cnn_pde_tpu.ops.pallas_fused_channel import fused_channel_diffusion_fwd
    from cnn_pde_tpu.pde import MixedChannelDiffusion

    layer = MixedChannelDiffusion(16, 3, dt=0.002, num_steps=steps,
                                  splitting=splitting)
    params, state = layer.init(key)
    params["alpha_time_coeff"] = jnp.asarray(
        rng.standard_normal((3, 16, 16)).astype(np.float32) * 0.1)
    u = jnp.asarray(rng.random((5, 3, 16, 16)).astype(np.float32))  # ragged
    ref, _ = layer(params, state, u)
    ts = np.asarray(_substep_times(0.002, steps))
    out = fused_channel_diffusion_fwd(
        u, params["alpha_base"], params["alpha_time_coeff"],
        params["beta_base"], params["beta_time_coeff"],
        params["channel_mixing"], dt=0.002, dx=1.0, dy=1.0, num_steps=steps,
        ts=ts, splitting=splitting, tile_b=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_fused_pads_ragged_batch(rng, key):
    H = W = 8
    layer = GrayscaleDiffusion(H, dt=0.01, num_steps=1)
    params, state = layer.init(key)
    u = jnp.asarray(rng.random((3, 1, H, W)).astype(np.float32))  # 3 % 4 != 0
    ref, _ = layer(params, state, u)
    ts = np.asarray(_substep_times(0.01, 1))
    out = fused_grayscale_diffusion_fwd(
        u[:, 0], params["alpha_base"], params["alpha_time_coeff"],
        params["beta_base"], params["beta_time_coeff"],
        dt=0.01, dx=1.0, dy=1.0, num_steps=1, ts=ts, tile_b=4,
        interpret=True)
    assert out.shape == (3, H, W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[:, 0]),
                               rtol=1e-5, atol=1e-6)
