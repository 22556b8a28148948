"""Stage decomposition of the flagship CIFAR10PDENoConv train step.

Times each candidate stage with the PERF.md protocol: N iterations chained
inside ONE jitted lax.fori_loop, synced by a forced device->host value fetch
(axon's block_until_ready can return early), min over samples, all candidates
A/B'd back-to-back in one process.

Usage: python tools/profile_flagship.py [--batch-size 64] [--n 300]
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
    ap.add_argument("--n", type=int, default=300)
    ap.add_argument("--impl", default=None,
                    help="solver impl to profile under (e.g. matinv_bf16)")
    ap.add_argument("--amp", action="store_true",
                    help="profile the production AMP config (pde.enable_amp: "
                         "hoisted-bf16 layers + matinv_bf16 solves)")
    args = ap.parse_args()

    if args.impl:
        from cnn_pde_tpu.ops.tridiag import set_default_impl
        set_default_impl(args.impl)

    from cnn_pde_tpu.data import build_augment_fn
    from cnn_pde_tpu.models import CIFAR10PDENoConv
    from cnn_pde_tpu.nn import Ctx
    from cnn_pde_tpu.train import Trainer
    from cnn_pde_tpu.utils.config import get_preset

    preset = get_preset("cifar10_noconv")
    model = CIFAR10PDENoConv()
    if args.amp:
        from cnn_pde_tpu.pde import enable_amp
        enable_amp(model)
    trainer = Trainer(model, preset.make_train_config(batch_size=args.batch_size),
                      preset.make_schedule(100),
                      augment_fn=build_augment_fn(preset.augment))
    state = trainer.init_state(jax.random.PRNGKey(0), None)
    raw = trainer._make_train_step(state.params).raw

    g = np.random.default_rng(0)
    B = args.batch_size
    images = jnp.asarray(g.random((B, 3, 32, 32)).astype(np.float32))
    labels = jnp.asarray(g.integers(0, 10, B).astype(np.int32))
    rng = jax.random.PRNGKey(1)
    augment = build_augment_fn(preset.augment)

    p0, m0, o0 = state.params, state.model_state, state.opt_state
    results = {}

    # ---- full step ----
    def full_body(i, carry):
        p, m, o = carry
        p, m, o, loss, acc = raw(p, m, o, i, images, labels, rng)
        return (p, m, o)

    results["full_step"] = timed_loop(full_body, (p0, m0, o0), args.n)

    # ---- augmentation only (carry the images so the loop isn't DCE'd) ----
    def aug_body(i, x):
        r = jax.random.fold_in(rng, i)
        return augment(r, x)

    results["augment"] = timed_loop(aug_body, images, args.n)

    # ---- model fwd+bwd (no augment, no optimizer) ----
    from cnn_pde_tpu.train.losses import cross_entropy

    def loss_fn(p, m, x, r):
        logits, new_m = model.apply(p, m, x, Ctx(train=True, rng=r))
        return cross_entropy(logits, labels, 0.1), new_m

    def fwdbwd_body(i, carry):
        p, m = carry
        r = jax.random.fold_in(rng, i)
        (loss, new_m), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, m, images, r)
        # fold grads back into params so the chain has a data dependence
        p = jax.tree_util.tree_map(lambda a, b: a - 1e-12 * b, p, grads)
        return (p, new_m)

    results["model_fwd_bwd"] = timed_loop(fwdbwd_body, (p0, m0), args.n)

    # ---- model fwd only ----
    def fwd_body(i, carry):
        p, m = carry
        r = jax.random.fold_in(rng, i)
        loss, new_m = loss_fn(p, m, images, r)
        return (jax.tree_util.tree_map(
            lambda a: a + 1e-30 * loss, p), new_m)

    results["model_fwd"] = timed_loop(fwd_body, (p0, m0), args.n)

    # ---- the 3 PDE branches, fwd+bwd, separately and together ----
    ext = model.extractor
    pe, se = p0["feature_extractor"], m0["feature_extractor"]

    for idx in (None, 0, 1, 2):
        branches = [0, 1, 2] if idx is None else [idx]

        def pde_loss(pp, x):
            tot = 0.0
            for i in branches:
                f, _ = ext.pdes[i].apply(pp[f"pde{i+1}"], se[f"pde{i+1}"],
                                         x, Ctx(train=True, rng=rng))
                tot = tot + jnp.sum(f ** 2)
            return tot

        def pde_body(i, carry):
            pp, x = carry
            val, grads = jax.value_and_grad(pde_loss)(pp, x)
            pp = jax.tree_util.tree_map(lambda a, b: a - 1e-12 * b, pp, grads)
            return (pp, x)

        name = "pde_all3" if idx is None else f"pde_branch{idx+1}"
        results[name] = timed_loop(pde_body, (pe, images), args.n)

    # ---- head-only (attention + BN + pools + FC), fwd+bwd ----
    feats = images  # same shape (B,3,32,32) as the extractor output

    def head_loss(p, m, f0):
        new_state = dict(m["feature_extractor"])
        feats_list = []
        for i in range(3):
            f, new_state[f"attention{i+1}"] = ext.attentions[i].apply(
                p["feature_extractor"][f"attention{i+1}"],
                m["feature_extractor"][f"attention{i+1}"], f0,
                Ctx(train=True, rng=rng))
            feats_list.append(f)
        w = jax.nn.softmax(p["feature_extractor"]["combine_weights"])
        f = w[0] * feats_list[0] + w[1] * feats_list[1] + w[2] * feats_list[2]
        f, _ = model.feature_bn.apply(p["feature_bn"], m["feature_bn"], f,
                                      Ctx(train=True, rng=rng))
        avg, _ = model.avg_pool.apply({}, {}, f, Ctx(train=False))
        mx, _ = model.max_pool.apply({}, {}, f, Ctx(train=False))
        flat = jnp.concatenate([avg, mx], 1).reshape(f.shape[0], -1)
        y, _ = model.classifier.apply(p["classifier"], m["classifier"], flat,
                                      Ctx(train=True, rng=rng))
        return cross_entropy(y, labels, 0.1)

    def head_body(i, carry):
        p, f0 = carry
        val, grads = jax.value_and_grad(head_loss)(p, m0, f0)
        p = jax.tree_util.tree_map(lambda a, b: a - 1e-12 * b, p, grads)
        return (p, f0)

    results["attn_bn_pool_fc"] = timed_loop(head_body, (p0, feats), args.n)

    print(json.dumps({k: round(v, 4) for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
