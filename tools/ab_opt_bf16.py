"""A/B bf16 Adam moment storage on the optimizer-traffic-bound presets.

PERF.md §tiny_imagenet: grouped-AdamW streaming over 11-30M params is
~0.5 ms of the tiny step (and larger on hybrid) — ~10 memory passes at
f32.  Storing the moments in bf16 cuts the m/v read+write bytes in half
(m,v are 8 of the ~28 streamed bytes/param): the measurable ceiling is
~15-30%% of optimizer time.  Variants:

* f32       — the default build_optimizer chain
* mu_bf16   — optax.adamw(mu_dtype=bfloat16) (first moment only; stock)
* munu_bf16 — both moments bf16 via a custom scale_by_adam with f32
              compute and bf16 state (nu in bf16 keeps f32 range; the
              sqrt halves its ~0.4%% mantissa noise, Adam-tolerant)

Protocol: PERF.md — full train step, N chained in one jitted fori_loop,
value-fetch sync, first variant re-measured last.

Usage: python tools/ab_opt_bf16.py [--n 200] [--presets tiny_imagenet cifar10_hybrid]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from _bench import timed_loop




def make_opt(variant, schedule, wd=1e-4, clip=1.0):
    if variant == "f32":
        inner = optax.adamw(schedule, weight_decay=wd)
    elif variant == "mu_bf16":
        inner = optax.adamw(schedule, weight_decay=wd,
                            mu_dtype=jnp.bfloat16)
    elif variant == "munu_bf16":
        from cnn_pde_tpu.train import scale_by_adam_low_precision
        inner = optax.chain(
            scale_by_adam_low_precision(dtype=jnp.bfloat16),
            optax.add_decayed_weights(wd),
            optax.scale_by_learning_rate(schedule))
    else:
        raise ValueError(variant)
    return optax.chain(optax.clip_by_global_norm(clip), inner)


def bench(preset_name, variant, n):
    from cnn_pde_tpu.data import SYNTHETIC_SPECS, build_augment_fn
    from cnn_pde_tpu.models import MODEL_REGISTRY
    from cnn_pde_tpu.nn import Ctx
    from cnn_pde_tpu.pde import enable_amp
    from cnn_pde_tpu.train import cross_entropy
    from cnn_pde_tpu.utils.config import get_preset

    preset = get_preset(preset_name)
    channels, size, classes = SYNTHETIC_SPECS[preset.dataset]
    bs = preset.batch_size
    model = MODEL_REGISTRY[preset.model](**preset.model_kwargs)
    enable_amp(model)  # the production AMP config for these presets
    params, state = model.init(jax.random.PRNGKey(0))
    opt = make_opt(variant, lambda s: 1e-3)
    opt_state = opt.init(params)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((bs, channels, size, size), ).astype(np.float32))
    y = jnp.asarray(rng.integers(0, classes, bs).astype(np.int32))

    def body(i, carry):
        p, o = carry

        def loss_fn(p):
            logits, _ = model.apply(p, state, x, Ctx(train=False))
            return cross_entropy(logits, y, 0.1)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o

    return timed_loop(body, (params, opt_state), n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--presets", nargs="+",
                    default=["tiny_imagenet", "cifar10_hybrid"])
    args = ap.parse_args()

    out = {}
    for preset in args.presets:
        res = {}
        for variant in ["f32", "mu_bf16", "munu_bf16", "f32_recheck"]:
            v = variant.replace("_recheck", "")
            res[variant] = round(bench(preset, v, args.n), 4)
            print(f"{preset} {variant}: {res[variant]} ms/step", flush=True)
        out[preset] = res
    print(json.dumps(out))


if __name__ == "__main__":
    main()
