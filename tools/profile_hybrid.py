"""Stage decomposition of the cifar10_hybrid train step (the slowest preset).

Same protocol as tools/profile_flagship.py: chained fori_loop, forced value
fetch, min over samples, one process.

Usage: python tools/profile_hybrid.py [--batch-size 64] [--n 200]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench import timed_loop




def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--amp", action="store_true",
                    help="profile under pde.enable_amp")
    args = ap.parse_args()

    from cnn_pde_tpu.data import build_augment_fn
    from cnn_pde_tpu.models import CIFAR10HybridPDEModel
    from cnn_pde_tpu.nn import Ctx
    from cnn_pde_tpu.train import Trainer
    from cnn_pde_tpu.train.losses import cross_entropy
    from cnn_pde_tpu.utils.config import get_preset

    preset = get_preset("cifar10_hybrid")
    model = CIFAR10HybridPDEModel()
    if args.amp:
        from cnn_pde_tpu.pde import enable_amp

        enable_amp(model)
    trainer = Trainer(model,
                      preset.make_train_config(batch_size=args.batch_size),
                      preset.make_schedule(100),
                      augment_fn=build_augment_fn(preset.augment))
    state = trainer.init_state(jax.random.PRNGKey(0), None)
    raw = trainer._make_train_step(state.params).raw

    g = np.random.default_rng(0)
    B = args.batch_size
    images = jnp.asarray(g.random((B, 3, 32, 32)).astype(np.float32))
    labels = jnp.asarray(g.integers(0, 10, B).astype(np.int32))
    rng = jax.random.PRNGKey(1)

    p0, m0, o0 = state.params, state.model_state, state.opt_state
    results = {}

    def full_body(i, carry):
        p, m, o = carry
        p, m, o, loss, acc = raw(p, m, o, i, images, labels, rng)
        return (p, m, o)

    results["full_step"] = timed_loop(full_body, (p0, m0, o0), args.n)

    # per-submodule fwd+bwd
    ext = model.feature_extractor
    pe, se = p0["feature_extractor"], m0["feature_extractor"]
    mods = [("diffusion1", ext.diffusion1), ("diffusion2", ext.diffusion2),
            ("parabolic", ext.parabolic), ("hamiltonian", ext.hamiltonian),
            ("attention", model.attention)]
    for name, mod in mods:
        pp = pe[name] if name != "attention" else p0["attention"]
        ss = se[name] if name != "attention" else m0["attention"]

        def mod_loss(pp, x):
            f, _ = mod.apply(pp, ss, x, Ctx(train=True, rng=rng))
            return jnp.sum(f ** 2)

        def body(i, carry):
            pp, x = carry
            val, grads = jax.value_and_grad(mod_loss)(pp, x)
            pp = jax.tree_util.tree_map(lambda a, b: a - 1e-12 * b, pp, grads)
            return (pp, x)

        results[name] = timed_loop(body, (pp, images), args.n)

    def head_loss(p, f):
        avg, _ = model.avg_pool.apply({}, {}, f, Ctx(train=False))
        mx, _ = model.max_pool.apply({}, {}, f, Ctx(train=False))
        flat = jnp.concatenate([avg, mx], 1).reshape(f.shape[0], -1)
        y, _ = model.classifier.apply(p["classifier"], m0["classifier"], flat,
                                      Ctx(train=True, rng=rng))
        return cross_entropy(y, labels, 0.1)

    def head_body(i, carry):
        p, f = carry
        val, grads = jax.value_and_grad(head_loss)(p, f)
        p = jax.tree_util.tree_map(lambda a, b: a - 1e-12 * b, p, grads)
        return (p, f)

    results["pool_fc_head"] = timed_loop(head_body, (p0, images), args.n)
    print(json.dumps({k: round(v, 4) for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
