"""Tiny-ImageNet classifier (M13): optional PDE front-end + ResNet-18-style
backbone (tiny_imagenet.py:237-329).

The reference's epoch-end monitoring reads a nonexistent ``spatial_modulation``
attribute and crashes (tiny_imagenet.py:614, SURVEY.md §2.7); this rebuild
exposes the parameters that actually exist."""

from __future__ import annotations

import jax

from ..nn import (
    AdaptiveAvgPool2d,
    BatchNorm,
    Conv2d,
    Dropout,
    Linear,
    MaxPool2d,
    Module,
    ReLU,
)
from ..pde import ResidualDiffusion

__all__ = ["BasicBlock", "TinyImageNetClassifier"]


class BasicBlock(Module):
    """Residual block (tiny_imagenet.py:308-329)."""

    def __init__(self, in_planes, planes, stride=1):
        self.conv1 = Conv2d(in_planes, planes, 3, stride=stride, padding=1,
                            bias=False, weight_init="kaiming_normal_fan_out")
        self.bn1 = BatchNorm(planes)
        self.conv2 = Conv2d(planes, planes, 3, stride=1, padding=1,
                            bias=False, weight_init="kaiming_normal_fan_out")
        self.bn2 = BatchNorm(planes)
        self.has_shortcut = stride != 1 or in_planes != planes
        if self.has_shortcut:
            self.sc_conv = Conv2d(in_planes, planes, 1, stride=stride,
                                  bias=False, weight_init="kaiming_normal_fan_out")
            self.sc_bn = BatchNorm(planes)

    def init(self, key):
        keys = jax.random.split(key, 4)
        params, state = {}, {}
        for name, mod, k in [("conv1", self.conv1, keys[0]),
                             ("bn1", self.bn1, keys[1]),
                             ("conv2", self.conv2, keys[2]),
                             ("bn2", self.bn2, keys[3])]:
            params[name], state[name] = mod.init(k)
        if self.has_shortcut:
            k5, k6 = jax.random.split(keys[0])
            params["sc_conv"], state["sc_conv"] = self.sc_conv.init(k5)
            params["sc_bn"], state["sc_bn"] = self.sc_bn.init(k6)
        return params, state

    def apply(self, params, state, x, ctx):
        ns = {}
        out, ns["conv1"] = self.conv1.apply(params["conv1"], state["conv1"], x, ctx)
        out, ns["bn1"] = self.bn1.apply(params["bn1"], state["bn1"], out, ctx)
        out = jax.nn.relu(out)
        out, ns["conv2"] = self.conv2.apply(params["conv2"], state["conv2"], out, ctx)
        out, ns["bn2"] = self.bn2.apply(params["bn2"], state["bn2"], out, ctx)
        if self.has_shortcut:
            sc, ns["sc_conv"] = self.sc_conv.apply(
                params["sc_conv"], state["sc_conv"], x, ctx)
            sc, ns["sc_bn"] = self.sc_bn.apply(
                params["sc_bn"], state["sc_bn"], sc, ctx)
        else:
            sc = x
        return jax.nn.relu(out + sc), ns


class TinyImageNetClassifier(Module):
    """M13 (tiny_imagenet.py:237-305): [PDE] → conv7×7/2 BN ReLU maxpool3/2 →
    4 stages of 2 BasicBlocks (64/128/256/512) → GAP → dropout(0.3) → fc 200."""

    def __init__(self, num_classes=200, use_pde=True, dropout_rate=0.3,
                 pde_implicit=False):
        self.use_pde = use_pde
        if use_pde:
            self.diff = ResidualDiffusion(size=64, channels=3, num_steps=1,
                                          use_implicit=pde_implicit)
        self.conv1 = Conv2d(3, 64, 7, stride=2, padding=3, bias=False,
                            weight_init="kaiming_normal_fan_out")
        self.bn1 = BatchNorm(64)
        self.maxpool = MaxPool2d(3, stride=2, padding=1)
        self.stages = []
        for in_p, planes, stride in [(64, 64, 1), (64, 128, 2),
                                     (128, 256, 2), (256, 512, 2)]:
            self.stages.append([BasicBlock(in_p, planes, stride),
                                BasicBlock(planes, planes, 1)])
        self.avgpool = AdaptiveAvgPool2d(1)
        self.dropout = Dropout(dropout_rate)
        self.fc = Linear(512, num_classes, weight_init="normal0.01")

    def init(self, key):
        keys = jax.random.split(key, 12)
        params, state = {}, {}
        ki = 0
        if self.use_pde:
            params["diff"], state["diff"] = self.diff.init(keys[ki]); ki += 1
        params["conv1"], state["conv1"] = self.conv1.init(keys[ki]); ki += 1
        params["bn1"], state["bn1"] = self.bn1.init(keys[ki]); ki += 1
        for si, stage in enumerate(self.stages):
            for bi, block in enumerate(stage):
                name = f"layer{si+1}.{bi}"
                params[name], state[name] = block.init(keys[ki]); ki += 1
        params["fc"], state["fc"] = self.fc.init(keys[ki])
        return params, state

    def apply(self, params, state, x, ctx):
        ns = {}
        if self.use_pde:
            x, ns["diff"] = self.diff.apply(params["diff"], state["diff"], x, ctx)
        y, ns_bb = self.backbone(params, state, x, ctx)
        ns.update(ns_bb)
        return y, ns

    def backbone(self, params, state, x, ctx):
        """The ResNet stages after the (optional) PDE front-end — split out
        so spatially-sharded front-ends (parallel/spatial_model.py) can reuse
        the identical classifier path."""
        ns = {}
        x, ns["conv1"] = self.conv1.apply(params["conv1"], state["conv1"], x, ctx)
        x, ns["bn1"] = self.bn1.apply(params["bn1"], state["bn1"], x, ctx)
        x = jax.nn.relu(x)
        x, _ = self.maxpool.apply({}, {}, x, ctx)
        for si, stage in enumerate(self.stages):
            for bi, block in enumerate(stage):
                name = f"layer{si+1}.{bi}"
                x, ns[name] = block.apply(params[name], state[name], x, ctx)
        x, _ = self.avgpool.apply({}, {}, x, ctx)
        x = x.reshape(x.shape[0], -1)
        x, _ = self.dropout.apply({}, {}, x, ctx)
        y, ns["fc"] = self.fc.apply(params["fc"], state["fc"], x, ctx)
        return y, ns
