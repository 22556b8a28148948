"""Stage decomposition of the flagship augmentation pipeline.

Each sub-transform timed with the PERF.md protocol (chained fori_loop, one
process, forced value-fetch sync).  The flagship (cifar10_noconv) spec is
crop_padding=4 + hflip + rotation=10 + ColorJitter(0.2,0.2,0.2,0.1) +
Normalize + RandomErasing(0.1).

Usage: python tools/profile_augment.py [--batch-size 64] [--n 300]
"""

import argparse
import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench import timed_loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--n", type=int, default=300)
    args = ap.parse_args()

    from cnn_pde_tpu.data import augment as A
    from cnn_pde_tpu.data import build_augment_fn
    from cnn_pde_tpu.utils.config import get_preset

    spec = get_preset("cifar10_noconv").augment
    full = build_augment_fn(spec)

    g = np.random.default_rng(0)
    B = args.batch_size
    images = jnp.asarray(g.random((B, 3, 32, 32)).astype(np.float32))
    rng = jax.random.PRNGKey(1)
    results = {}

    def run(name, per_image_fn):
        def body(i, x):
            r = jax.random.fold_in(rng, i)
            rngs = jax.random.split(r, x.shape[0])
            return jax.vmap(per_image_fn)(rngs, x)

        results[name] = timed_loop(body, images, args.n)

    def full_body(i, x):
        return full(jax.random.fold_in(rng, i), x)

    results["full"] = timed_loop(full_body, images, args.n)

    run("crop_pad4", partial(A._random_crop_pad, padding=spec.crop_padding))
    run("hflip", partial(A._hflip, p=spec.hflip))
    run("rotate", partial(A._rotate, degrees=spec.rotation))
    run("color_jitter", partial(A._color_jitter, brightness=spec.brightness,
                                contrast=spec.contrast,
                                saturation=spec.saturation, hue=spec.hue))
    run("erasing", partial(A._random_erasing, p=spec.erasing_p))

    def norm_body(i, x):
        mean = jnp.asarray(spec.mean, jnp.float32)[:, None, None]
        std = jnp.asarray(spec.std, jnp.float32)[:, None, None]
        return (x - mean) / std + 1e-9 * i

    results["normalize"] = timed_loop(norm_body, images, args.n)

    print(json.dumps({k: round(v, 4) for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
