"""CIFAR-10 no-convolution model (M5-M7): multi-scale PDE feature extraction +
spatial attention + enhanced FC head (cifar10.py:215-361)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import (
    AdaptiveAvgPool2d,
    AdaptiveMaxPool2d,
    BatchNorm,
    Dropout,
    Linear,
    Module,
    ReLU,
    Sequential,
)
from ..pde import MixedChannelDiffusion
from .attention import SpatialAttention

__all__ = ["MultiScaleExtractor", "EnhancedFC", "CIFAR10PDENoConv"]


class MultiScaleExtractor(Module):
    """M5 (cifar10.py:248-282): 3 Strang PDE layers at different temporal/
    spatial scales, each gated by SpatialAttention, softmax-combined.

    fused=True evolves the three branches in lockstep on stacked state
    (pde/fused_multiscale.py): 8 sequential step-triples instead of 17,
    identical activations, identical parameter layout.
    """

    _SCALES = [dict(dt=0.001, num_steps=5, dx=1.0, dy=1.0),
               dict(dt=0.002, num_steps=8, dx=2.0, dy=2.0),
               dict(dt=0.005, num_steps=4, dx=1.5, dy=1.5)]

    def __init__(self, input_size=32, channels=3, fused=False,
                 fused_pde=False):
        # fused_pde=True runs each branch's whole evolution as single Pallas
        # kernels (fwd+bwd, ops/pallas_fused_channel_vjp.py); mutually
        # exclusive with the lockstep-stacked fused (multiscale) mode
        assert not (fused and fused_pde)
        self.fused = fused
        # lockstep_hoisted=True evolves the three branches in lockstep on
        # stacked state with PRECOMPUTED sweep operators (identity-padded):
        # 24 sequential stacked-matmul sweeps instead of 51
        # (pde/fused_multiscale.py::hoisted_lockstep_evolve).  Operator
        # dtype/eps/clamp follow the branch layers' settings (enable_amp
        # sets bf16).
        self.lockstep_hoisted = False
        # branch_sharding: NamedSharding for the stacked (B, K, C, H, W)
        # state — BRANCH PARALLELISM over a mesh axis (each device evolves
        # only its branches; zero collectives inside the scan).  Set via
        # parallel.enable_branch_parallel; implies the lockstep path.
        self.branch_sharding = None
        self.pdes = [
            MixedChannelDiffusion(input_size, channels, splitting="strang",
                                  fused=fused_pde, **scale)
            for scale in self._SCALES
        ]
        self.attentions = [SpatialAttention(channels, input_size) for _ in range(3)]

    def init(self, key):
        keys = jax.random.split(key, 6)
        params, state = {}, {}
        for i in range(3):
            params[f"pde{i+1}"], state[f"pde{i+1}"] = self.pdes[i].init(keys[i])
            params[f"attention{i+1}"], state[f"attention{i+1}"] = \
                self.attentions[i].init(keys[3 + i])
        params["combine_weights"] = jnp.ones((3,), jnp.float32) / 3
        return params, state

    def apply(self, params, state, x, ctx):
        new_state = dict(state)
        if self.lockstep_hoisted or self.branch_sharding is not None:
            from ..pde.fused_multiscale import hoisted_lockstep_evolve

            stacked = hoisted_lockstep_evolve(
                x, [params[f"pde{i+1}"] for i in range(3)],
                dts=[s["dt"] for s in self._SCALES],
                steps_list=[s["num_steps"] for s in self._SCALES],
                dxs=[s["dx"] for s in self._SCALES],
                dys=[s["dy"] for s in self._SCALES],
                eps=self.pdes[0].eps, clamp_max=self.pdes[0].clamp_max,
                operator_dtype=self.pdes[0].operator_dtype,
                branch_sharding=self.branch_sharding)
            branch_feats = [stacked[:, i] for i in range(3)]
        elif self.fused:
            from ..pde.fused_multiscale import fused_multiscale_evolve

            stacked = fused_multiscale_evolve(
                x, [params[f"pde{i+1}"] for i in range(3)],
                dts=[s["dt"] for s in self._SCALES],
                steps_list=[s["num_steps"] for s in self._SCALES],
                dxs=[s["dx"] for s in self._SCALES],
                dys=[s["dy"] for s in self._SCALES])
            branch_feats = [stacked[i] for i in range(3)]
        else:
            branch_feats = []
            for i in range(3):
                f, new_state[f"pde{i+1}"] = self.pdes[i].apply(
                    params[f"pde{i+1}"], state[f"pde{i+1}"], x, ctx)
                branch_feats.append(f)
        feats = []
        for i, f in enumerate(branch_feats):
            f, new_state[f"attention{i+1}"] = self.attentions[i].apply(
                params[f"attention{i+1}"], state[f"attention{i+1}"], f, ctx)
            feats.append(f)
        w = jax.nn.softmax(params["combine_weights"])
        combined = w[0] * feats[0] + w[1] * feats[1] + w[2] * feats[2]
        return combined, new_state


class EnhancedFC(Module):
    """M6 (cifar10.py:286-314): [Linear, BN, ReLU, Dropout]×n + final Linear,
    kaiming_normal weights / zero bias on every Linear."""

    def __init__(self, input_size, hidden_sizes, num_classes, dropout_rate=0.3):
        layers = []
        prev = input_size
        for h in hidden_sizes:
            layers += [
                Linear(prev, h, weight_init="kaiming_normal"),
                BatchNorm(h), ReLU(), Dropout(dropout_rate),
            ]
            prev = h
        layers.append(Linear(prev, num_classes, weight_init="kaiming_normal"))
        self.net = Sequential(layers)

    def init(self, key):
        return self.net.init(key)

    def apply(self, params, state, x, ctx):
        return self.net.apply(params, state, x, ctx)


class CIFAR10PDENoConv(Module):
    """M7 (cifar10.py:318-361): extractor → BN2d → avg‖max 4×4 pools → cat →
    flatten 96 → EnhancedFC([512,256,128,64] → 10)."""

    def __init__(self, dropout_rate=0.3, fused_multiscale=False,
                 fused_pde=False):
        self.extractor = MultiScaleExtractor(32, 3, fused=fused_multiscale,
                                             fused_pde=fused_pde)
        self.feature_bn = BatchNorm(3)
        self.avg_pool = AdaptiveAvgPool2d(4)
        self.max_pool = AdaptiveMaxPool2d(4)
        self.classifier = EnhancedFC(96, [512, 256, 128, 64], 10, dropout_rate)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        pe, se = self.extractor.init(k1)
        pb, sb = self.feature_bn.init(k2)
        pc, sc = self.classifier.init(k3)
        return (
            {"feature_extractor": pe, "feature_bn": pb, "classifier": pc},
            {"feature_extractor": se, "feature_bn": sb, "classifier": sc},
        )

    def apply(self, params, state, x, ctx):
        f, se = self.extractor.apply(
            params["feature_extractor"], state["feature_extractor"], x, ctx)
        f, sb = self.feature_bn.apply(
            params["feature_bn"], state["feature_bn"], f, ctx)
        avg, _ = self.avg_pool.apply({}, {}, f, ctx)
        mx, _ = self.max_pool.apply({}, {}, f, ctx)
        pooled = jnp.concatenate([avg, mx], axis=1)  # (B, 6, 4, 4)
        flat = pooled.reshape(pooled.shape[0], -1)   # (B, 96)
        y, sc = self.classifier.apply(
            params["classifier"], state["classifier"], flat, ctx)
        return y, {"feature_extractor": se, "feature_bn": sb, "classifier": sc}
