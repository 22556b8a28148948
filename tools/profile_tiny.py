"""Stage decomposition of the tiny_imagenet train step (conv-backbone-bound).

Same protocol as profile_hybrid.py: chained fori_loop, forced value fetch,
min over samples, one process.

Usage: python tools/profile_tiny.py [--batch-size 32] [--n 100] [--amp]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench import timed_loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--amp", action="store_true")
    args = ap.parse_args()

    from cnn_pde_tpu.data import build_augment_fn
    from cnn_pde_tpu.models import MODEL_REGISTRY
    from cnn_pde_tpu.nn import Ctx
    from cnn_pde_tpu.train import Trainer
    from cnn_pde_tpu.train.losses import cross_entropy
    from cnn_pde_tpu.utils.config import get_preset

    preset = get_preset("tiny_imagenet")
    model = MODEL_REGISTRY[preset.model](**preset.model_kwargs)
    if args.amp:
        from cnn_pde_tpu.pde import enable_amp

        enable_amp(model)
    trainer = Trainer(model,
                      preset.make_train_config(batch_size=args.batch_size),
                      preset.make_schedule(100),
                      augment_fn=build_augment_fn(preset.augment))
    state = trainer.init_state(jax.random.PRNGKey(0), None)
    raw = trainer._make_train_step(state.params).raw
    aug_fn = build_augment_fn(preset.augment)

    g = np.random.default_rng(0)
    B = args.batch_size
    images = jnp.asarray(g.random((B, 3, 64, 64)).astype(np.float32))
    labels = jnp.asarray(g.integers(0, 200, B).astype(np.int32))
    rng = jax.random.PRNGKey(1)
    p0, m0, o0 = state.params, state.model_state, state.opt_state
    results = {}

    def full_body(i, carry):
        p, m, o = carry
        p, m, o, loss, acc = raw(p, m, o, i, images, labels, rng)
        return (p, m, o)

    results["full_step"] = timed_loop(full_body, (p0, m0, o0), args.n)

    # augmentation alone
    def aug_body(i, x):
        return aug_fn(jax.random.fold_in(rng, i), x)

    results["augment"] = timed_loop(aug_body, images, args.n)

    # PDE front-end fwd+bwd
    if model.use_pde:
        def pde_loss(pp, x):
            f, _ = model.diff.apply(pp, m0["diff"], x, Ctx(train=True, rng=rng))
            return jnp.sum(f ** 2)

        def pde_body(i, carry):
            pp, x = carry
            _, grads = jax.value_and_grad(pde_loss)(pp, x)
            pp = jax.tree_util.tree_map(lambda a, b: a - 1e-12 * b, pp, grads)
            return (pp, x)

        results["pde_front"] = timed_loop(pde_body, (p0["diff"], images),
                                          args.n)

    # whole model fwd+bwd (no optimizer, no augment)
    def model_loss(p, x):
        y, _ = model.apply(p, m0, x, Ctx(train=True, rng=rng))
        return cross_entropy(y, labels, 0.1)

    def model_body(i, carry):
        p, x = carry
        _, grads = jax.value_and_grad(model_loss)(p, x)
        p = jax.tree_util.tree_map(lambda a, b: a - 1e-12 * b, p, grads)
        return (p, x)

    results["model_fwd_bwd"] = timed_loop(model_body, (p0, images), args.n)

    # backbone only (stages after the stem) fwd+bwd, on stem-shaped input
    stem = jnp.zeros((B, 64, 16, 16), jnp.float32)

    def stages_loss(p, x):
        ns_ctx = Ctx(train=True, rng=rng)
        for si, stage in enumerate(model.stages):
            for bi, block in enumerate(stage):
                name = f"layer{si+1}.{bi}"
                x, _ = block.apply(p[name], m0[name], x, ns_ctx)
        return jnp.sum(x ** 2)

    def stages_body(i, carry):
        p, x = carry
        _, grads = jax.value_and_grad(stages_loss)(p, x)
        p = jax.tree_util.tree_map(lambda a, b: a - 1e-12 * b, p, grads)
        return (p, x)

    stage_params = {f"layer{si+1}.{bi}": p0[f"layer{si+1}.{bi}"]
                    for si in range(4) for bi in range(2)}
    results["resnet_stages"] = timed_loop(stages_body, (stage_params, stem),
                                          args.n)

    # optimizer alone: apply the grouped-AdamW update with constant grads
    opt = trainer._optimizer(p0)
    zeros_g = jax.tree_util.tree_map(jnp.zeros_like, p0)

    def opt_body(i, carry):
        p, o = carry
        updates, o = opt.update(zeros_g, o, p)
        import optax

        return (optax.apply_updates(p, updates), o)

    results["optimizer"] = timed_loop(opt_body, (p0, o0), args.n)

    print(json.dumps({k: round(v, 4) for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
