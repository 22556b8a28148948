"""Build a NEW PDE layer from the framework's kernels and train through it.

Shows the extension points a reference user needs when outgrowing the
stock DiffusionLayer family: the ``nn.Module`` protocol (init/apply), the
L1 kernels (`ops.adi.sweep_x`/`sweep_y`, `ops.stencil.ftcs_evolve`,
`ops.smoothing.smooth3`), and that everything differentiates — the
learnable anisotropy ratio here gets real gradients through the implicit
ADI solves.

Usage: python examples/02_custom_pde_layer.py
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import optax

from cnn_pde_tpu.nn import Ctx, Flatten, Linear, Module, Sequential
from cnn_pde_tpu.ops.adi import sweep_x, sweep_y
from cnn_pde_tpu.train import cross_entropy


class AnisotropicDiffusion(Module):
    """One learnable scalar per axis: u evolves under alpha in x, beta in y.

    A minimal custom layer — compare pde/diffusion.py's GrayscaleDiffusion
    (per-pixel coefficient FIELDS, time dependence, clamping) for the
    production version of the same structure.
    """

    def __init__(self, size=16, dt=0.05, num_steps=4):
        self.size, self.dt, self.num_steps = size, dt, num_steps

    def init(self, key):
        # softplus-parameterized so the diffusivities stay positive
        return {"raw_alpha": jnp.zeros(()), "raw_beta": jnp.zeros(())}, {}

    def apply(self, params, state, x, ctx):
        alpha = jax.nn.softplus(params["raw_alpha"]) + 1e-3
        beta = jax.nn.softplus(params["raw_beta"]) + 1e-3
        H = W = self.size
        a = jnp.broadcast_to(alpha, (H, W))
        b = jnp.broadcast_to(beta, (H, W))
        u = x[:, 0]
        for _ in range(self.num_steps):  # Strang: x(dt/2) y(dt) x(dt/2)
            u = sweep_x(u, a, self.dt / 2, 1.0, smooth=False, eps=1e-6)
            u = sweep_y(u, b, self.dt, 1.0, smooth=False, eps=1e-6)
            u = sweep_x(u, a, self.dt / 2, 1.0, smooth=False, eps=1e-6)
        return u[:, None], state


def main():
    model = Sequential([AnisotropicDiffusion(), Flatten(), Linear(256, 4)])
    params, mstate = model.init(jax.random.PRNGKey(0))

    # synthetic task: classify which quadrant a hot spot sits in
    rng = jax.random.PRNGKey(1)
    xs, ys = [], []
    for q in range(4):
        k = jax.random.fold_in(rng, q)
        pos = (4 + 8 * (q % 2), 4 + 8 * (q // 2))
        img = jnp.zeros((16, 16)).at[pos].set(50.0)
        xs.append(img[None]), ys.append(q)
    x = jnp.stack(xs)
    y = jnp.asarray(ys)

    opt = optax.adam(0.05)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits, _ = model.apply(p, mstate, x, Ctx(train=False))
            return cross_entropy(logits, y, 0.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(30):
        params, opt_state, loss = step(params, opt_state)
        if i % 10 == 0:
            print(f"step {i}: loss {float(loss):.4f}")
    a = float(jax.nn.softplus(params["0"]["raw_alpha"]))
    b = float(jax.nn.softplus(params["0"]["raw_beta"]))
    print(f"final loss {float(loss):.4f}; learned alpha={a:.3f} beta={b:.3f}")
    assert float(loss) < 1.0


if __name__ == "__main__":
    main()
