"""Core layers with PyTorch-parity semantics, TPU-idiomatic implementations.

Everything here is shape-static and jit-friendly; matmuls/convs hit the MXU via
XLA (bf16-ready through the precision policy in train/), elementwise work fuses
on the VPU.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax

from . import initializers as init
from .core import Module

__all__ = [
    "Linear",
    "BatchNorm",
    "Dropout",
    "Conv2d",
    "MaxPool2d",
    "AdaptiveAvgPool2d",
    "AdaptiveMaxPool2d",
    "Flatten",
    "ReLU",
    "Tanh",
    "Sigmoid",
    "Identity",
    "Lambda",
]


class Linear(Module):
    """y = x @ W + b with torch-default init (kaiming_uniform a=√5), or the
    explicit schemes the reference uses ('kaiming_normal' + zero bias at
    cifar10.py:308-311, 'normal0.01' at tiny_imagenet.py:282-284).

    ``compute_dtype`` (default None = exact input dtype) casts the matmul
    OPERANDS only, accumulating in f32 on the MXU — the torch
    ``autocast``-on-nn.Linear analogue (cifar10.py:440).  Master params and
    the bias add stay f32; ``pde.enable_amp`` flips this to bf16."""

    def __init__(self, in_features, out_features, bias=True, weight_init="torch_default",
                 compute_dtype=None):
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = bias
        self.weight_init = weight_init
        self.compute_dtype = compute_dtype

    def init(self, key):
        kw, kb = jax.random.split(key)
        shape = (self.in_features, self.out_features)
        if self.weight_init == "torch_default":
            w = init.kaiming_uniform_a5(kw, shape, self.in_features)
            b = (init.torch_bias_default(kb, (self.out_features,), self.in_features)
                 if self.use_bias else None)
        elif self.weight_init == "kaiming_normal":
            w = init.kaiming_normal(kw, shape, self.in_features)
            b = init.zeros((self.out_features,)) if self.use_bias else None
        elif self.weight_init == "normal0.01":
            w = init.normal(kw, shape, 0.01)
            b = init.zeros((self.out_features,)) if self.use_bias else None
        elif self.weight_init == "eye_plus_noise":
            # SymmetricLayer K init: identity + 0.01·randn (cifar_2version.py:210-211)
            w = jnp.eye(self.in_features, self.out_features) + \
                jax.random.normal(kw, shape) * 0.01
            b = init.zeros((self.out_features,)) if self.use_bias else None
        else:
            raise ValueError(self.weight_init)
        p = {"w": w}
        if b is not None:
            p["b"] = b
        return p, {}

    def apply(self, params, state, x, ctx):
        cd = getattr(self, "compute_dtype", None)
        if cd is not None:
            y = jnp.dot(x.astype(cd), params["w"].astype(cd),
                        preferred_element_type=jnp.float32)
        else:
            y = x @ params["w"]
        if self.use_bias:
            y = y + params["b"]
        return y, state


class BatchNorm(Module):
    """BatchNorm over the channel axis with exact PyTorch semantics:
    eps=1e-5, momentum=0.1; train-mode normalizes with the *biased* batch
    variance but updates the running variance with the *unbiased* estimate;
    eval-mode uses running stats.  Covers BatchNorm1d ((B, C) inputs) and
    BatchNorm2d ((B, C, H, W) inputs) by reducing over all non-channel axes.
    """

    def __init__(self, num_features, eps=1e-5, momentum=0.1, channel_axis=1):
        self.num_features = num_features
        self.eps = eps
        self.momentum = momentum
        self.channel_axis = channel_axis

    def init(self, key):
        p = {"scale": init.ones((self.num_features,)),
             "bias": init.zeros((self.num_features,))}
        s = {"mean": init.zeros((self.num_features,)),
             "var": init.ones((self.num_features,))}
        return p, s

    def apply(self, params, state, x, ctx):
        axis = self.channel_axis % x.ndim
        reduce_axes = tuple(i for i in range(x.ndim) if i != axis)
        bshape = [1] * x.ndim
        bshape[axis] = self.num_features

        if getattr(ctx, "bn_stats", ctx.train):
            mean = jnp.mean(x, axis=reduce_axes)
            var = jnp.mean((x - mean.reshape(bshape)) ** 2, axis=reduce_axes)
            n = x.size // self.num_features
            unbiased = var * (n / max(n - 1, 1))
            m = self.momentum
            new_state = {
                "mean": (1 - m) * state["mean"] + m * mean,
                "var": (1 - m) * state["var"] + m * unbiased,
            }
            use_mean, use_var = mean, var
        else:
            new_state = state
            use_mean, use_var = state["mean"], state["var"]

        inv = lax.rsqrt(use_var.reshape(bshape) + self.eps)
        y = (x - use_mean.reshape(bshape)) * inv * params["scale"].reshape(bshape) \
            + params["bias"].reshape(bshape)
        return y, new_state


class Dropout(Module):
    def __init__(self, p):
        self.p = float(p)

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        if not ctx.train or self.p == 0.0:
            return x, state
        keep = 1.0 - self.p
        mask = jax.random.bernoulli(ctx.rng(), keep, x.shape)
        return jnp.where(mask, x / keep, 0.0), state


class Conv2d(Module):
    """NCHW conv matching torch.nn.Conv2d (OIHW kernel, torch-default or
    kaiming_normal fan_out init — tiny_imagenet.py:277-278).

    ``compute_dtype`` (default None = exact) casts the conv operands only,
    f32 accumulation — the torch autocast-on-nn.Conv2d analogue; flipped to
    bf16 by ``pde.enable_amp``."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, bias=True, groups=1, weight_init="torch_default",
                 compute_dtype=None):
        self.compute_dtype = compute_dtype
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = (kernel_size, kernel_size) if isinstance(kernel_size, int) else tuple(kernel_size)
        self.stride = (stride, stride) if isinstance(stride, int) else tuple(stride)
        self.padding = (padding, padding) if isinstance(padding, int) else tuple(padding)
        self.use_bias = bias
        self.groups = groups
        self.weight_init = weight_init

    def init(self, key):
        kw, kb = jax.random.split(key)
        kh, kwd = self.kernel_size
        shape = (self.out_channels, self.in_channels // self.groups, kh, kwd)
        fan_in = (self.in_channels // self.groups) * kh * kwd
        if self.weight_init == "torch_default":
            w = init.kaiming_uniform_a5(kw, shape, fan_in)
        elif self.weight_init == "kaiming_normal_fan_out":
            fan_out = self.out_channels * kh * kwd
            w = init.kaiming_normal(kw, shape, fan_out)
        else:
            raise ValueError(self.weight_init)
        p = {"w": w}
        if self.use_bias:
            p["b"] = init.torch_bias_default(kb, (self.out_channels,), fan_in)
        return p, {}

    def apply(self, params, state, x, ctx):
        ph, pw = self.padding
        cd = getattr(self, "compute_dtype", None)
        # bf16 OUTPUT (not preferred_element_type=f32): exactly autocast's
        # conv semantics, and it keeps fwd/bwd dtypes consistent — the conv
        # transpose rule rejects a f32 cotangent against bf16 operands.
        x_c, w_c = ((x.astype(cd), params["w"].astype(cd)) if cd is not None
                    else (x, params["w"]))
        y = lax.conv_general_dilated(
            x_c, w_c,
            window_strides=self.stride,
            padding=((ph, ph), (pw, pw)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=self.groups,
        )
        if cd is not None:
            y = y.astype(jnp.float32)
        if self.use_bias:
            y = y + params["b"][None, :, None, None]
        return y, state


class MaxPool2d(Module):
    def __init__(self, kernel_size, stride=None, padding=0):
        self.k = (kernel_size, kernel_size) if isinstance(kernel_size, int) else tuple(kernel_size)
        stride = stride if stride is not None else kernel_size
        self.s = (stride, stride) if isinstance(stride, int) else tuple(stride)
        self.p = (padding, padding) if isinstance(padding, int) else tuple(padding)

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        ph, pw = self.p
        y = lax.reduce_window(
            x, -jnp.inf, lax.max,
            window_dimensions=(1, 1) + self.k,
            window_strides=(1, 1) + self.s,
            padding=((0, 0), (0, 0), (ph, ph), (pw, pw)),
        )
        return y, state


def _adaptive_pool(x, out_hw, reduce_fn):
    """torch adaptive pooling: cell i spans [floor(i·S/O), ceil((i+1)·S/O))."""
    B, C, H, W = x.shape
    OH, OW = out_hw
    if H % OH == 0 and W % OW == 0:
        kh, kw = H // OH, W // OW
        xr = x.reshape(B, C, OH, kh, OW, kw)
        return reduce_fn(xr, axis=(3, 5))
    rows = []
    for i in range(OH):
        h0, h1 = (i * H) // OH, -(-((i + 1) * H) // OH)
        cols = []
        for j in range(OW):
            w0, w1 = (j * W) // OW, -(-((j + 1) * W) // OW)
            cols.append(reduce_fn(x[:, :, h0:h1, w0:w1], axis=(2, 3)))
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


class AdaptiveAvgPool2d(Module):
    def __init__(self, output_size):
        self.out = (output_size, output_size) if isinstance(output_size, int) else tuple(output_size)

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        return _adaptive_pool(x, self.out, jnp.mean), state


class AdaptiveMaxPool2d(Module):
    def __init__(self, output_size):
        self.out = (output_size, output_size) if isinstance(output_size, int) else tuple(output_size)

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        return _adaptive_pool(x, self.out, jnp.max), state


class Flatten(Module):
    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        return x.reshape(x.shape[0], -1), state


class _Activation(Module):
    fn = staticmethod(lambda x: x)

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        return self.fn(x), state


class ReLU(_Activation):
    fn = staticmethod(jax.nn.relu)


class Tanh(_Activation):
    fn = staticmethod(jnp.tanh)


class Sigmoid(_Activation):
    fn = staticmethod(jax.nn.sigmoid)


class Identity(_Activation):
    pass


class Lambda(Module):
    """Wrap a pure function as a layer."""

    def __init__(self, fn):
        self.fn = fn

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, ctx):
        return self.fn(x), state
