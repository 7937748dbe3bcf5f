"""Functional NN layers parameterized by Priors.

Re-design of reference `bnn_priors/models/layers.py`: there, `Linear`/
`Conv2d` subclass torch modules and route `weight`/`bias` through Prior
properties. Here layers are static `Module`s whose `apply` pulls the
effective weight via `Prior.forward` from the flat param store — the same
indirection, but traceable, so XLA fuses reparameterizations (exp/softplus/
Φ) straight into the matmul/conv.

Convolutions run in NHWC (TPU-native layout); weights are stored OIHW for
naming/shape parity with the reference and transposed at trace time (free:
XLA folds the transpose into the conv).
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..priors.base import Prior, join
from .base import Module

__all__ = ("Linear", "Conv2d", "Sequential", "ReLU", "MaxPool2d",
           "AvgPool2d", "GlobalAvgPool", "Flatten", "Reshape", "Identity",
           "BatchNorm2d", "to_nhwc")


def to_nhwc(x):
    "NCHW -> NHWC (networks accept torch-layout inputs, compute TPU-layout)."
    return jnp.transpose(x, (0, 2, 3, 1))


class Linear(Module):
    def __init__(self, weight_prior: Prior, bias_prior: Optional[Prior] = None):
        super().__init__()
        self.out_features, self.in_features = weight_prior.shape
        self.weight_prior = weight_prior
        if bias_prior is not None:
            self.bias_prior = bias_prior
        else:
            self.bias_prior = None

    def apply(self, params, state, prefix, x, train=False):
        w = self.weight_prior.forward(params, join(prefix, "weight_prior"))
        y = x @ w.T
        if self.bias_prior is not None:
            y = y + self.bias_prior.forward(params, join(prefix, "bias_prior"))
        return y, state


class Conv2d(Module):
    """2D convolution, weight shape (O, I/groups, kH, kW) like torch."""

    def __init__(self, weight_prior: Prior, bias_prior: Optional[Prior] = None,
                 stride: Union[int, Sequence[int]] = 1,
                 padding: Union[int, Sequence[int]] = 0,
                 dilation: Union[int, Sequence[int]] = 1, groups: int = 1):
        super().__init__()
        as_pair = lambda v: (v, v) if isinstance(v, int) else tuple(v)
        self.stride = as_pair(stride)
        self.padding = as_pair(padding)
        self.dilation = as_pair(dilation)
        self.groups = groups
        (self.out_channels, in_channels, kh, kw) = weight_prior.shape
        self.in_channels = in_channels * groups
        self.kernel_size = (kh, kw)
        self.weight_prior = weight_prior
        if bias_prior is not None:
            self.bias_prior = bias_prior
        else:
            self.bias_prior = None

    def apply(self, params, state, prefix, x, train=False):
        w = self.weight_prior.forward(params, join(prefix, "weight_prior"))
        # weights stay OIHW (torch storage layout): passing them via
        # dimension_numbers lets XLA's layout assignment pick the conv's
        # internal weight layout directly — an explicit HWIO transpose
        # materialized an extra per-step copy of every conv weight
        pad = [(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])]
        y = lax.conv_general_dilated(
            x, w, window_strides=self.stride, padding=pad,
            rhs_dilation=self.dilation, feature_group_count=self.groups,
            dimension_numbers=("NHWC", "OIHW", "NHWC"),
        )
        if self.bias_prior is not None:
            b = self.bias_prior.forward(params, join(prefix, "bias_prior"))
            y = y + b
        return y, state


class Sequential(Module):
    """Indexed container (child names "0", "1", ... match torch Sequential
    state_dict naming). `input_fn` applies a parameterless transform to the
    input without occupying an index, preserving reference name parity."""

    def __init__(self, *mods: Module, input_fn=None):
        super().__init__()
        self.mods = list(mods)
        self.input_fn = input_fn
        for i, m in enumerate(mods):
            setattr(self, str(i), m)

    def apply(self, params, state, prefix, x, train=False):
        if self.input_fn is not None:
            x = self.input_fn(x)
        for i, m in enumerate(self.mods):
            x, state = m.apply(params, state, join(prefix, str(i)), x, train)
        return x, state


class ReLU(Module):
    def apply(self, params, state, prefix, x, train=False):
        return jax.nn.relu(x), state


class Identity(Module):
    def apply(self, params, state, prefix, x, train=False):
        return x, state


class Flatten(Module):
    def apply(self, params, state, prefix, x, train=False):
        return x.reshape(x.shape[0], -1), state


class Reshape(Module):
    "Reshape trailing dims (reference conv_nets.py `Reshape`)."

    def __init__(self, *shape):
        super().__init__()
        self.shape = shape

    def apply(self, params, state, prefix, x, train=False):
        return x.reshape((x.shape[0],) + tuple(self.shape)), state


class MaxPool2d(Module):
    def __init__(self, kernel_size: int, stride: Optional[int] = None, padding: int = 0):
        super().__init__()
        self.kernel_size = kernel_size
        self.stride = stride or kernel_size
        self.padding = padding

    def apply(self, params, state, prefix, x, train=False):
        k, s, p = self.kernel_size, self.stride, self.padding
        y = lax.reduce_window(
            x, -jnp.inf, lax.max,
            window_dimensions=(1, k, k, 1), window_strides=(1, s, s, 1),
            padding=((0, 0), (p, p), (p, p), (0, 0)),
        )
        return y, state


class AvgPool2d(Module):
    def __init__(self, kernel_size: int, stride: Optional[int] = None, padding: int = 0):
        super().__init__()
        self.kernel_size = kernel_size
        self.stride = stride or kernel_size
        self.padding = padding

    def apply(self, params, state, prefix, x, train=False):
        k, s, p = self.kernel_size, self.stride, self.padding
        y = lax.reduce_window(
            x, 0.0, lax.add,
            window_dimensions=(1, k, k, 1), window_strides=(1, s, s, 1),
            padding=((0, 0), (p, p), (p, p), (0, 0)),
        )
        return y / (k * k), state


class GlobalAvgPool(Module):
    "Mean over spatial dims (NHWC)."

    def apply(self, params, state, prefix, x, train=False):
        return jnp.mean(x, axis=(1, 2)), state


class BatchNorm2d(Module):
    """Batchnorm over NHWC with torch semantics: batch stats in training
    (biased var for normalization, unbiased for the running update),
    running stats at eval. Running stats live in `state` and are part of
    every saved posterior sample, as in the reference (SURVEY §7)."""

    def __init__(self, num_features: int, eps: float = 1e-5, momentum: float = 0.1,
                 affine: bool = True):
        super().__init__()
        self.num_features = num_features
        self.eps = eps
        self.momentum = momentum
        self.affine = affine
        if affine:
            self.declare_param("weight", (num_features,), lambda k, s: jnp.ones(s))
            self.declare_param("bias", (num_features,), lambda k, s: jnp.zeros(s))
        self.declare_buffer("running_mean", (num_features,), lambda k, s: jnp.zeros(s))
        self.declare_buffer("running_var", (num_features,), lambda k, s: jnp.ones(s))
        self.declare_buffer("num_batches_tracked", (), lambda k, s: jnp.zeros(s),
                            dtype=jnp.int32)

    def apply(self, params, state, prefix, x, train=False):
        rm_key = join(prefix, "running_mean")
        rv_key = join(prefix, "running_var")
        nb_key = join(prefix, "num_batches_tracked")
        if train:
            axes = (0, 1, 2)
            # single-pass moments: E[x] and E[x^2] fuse into ONE read of
            # the activation (jnp.var would re-read it for the centered
            # pass — measured as a separate full HBM sweep per BN layer),
            # accumulated in f32 regardless of compute dtype. Same
            # formula torch's native batch_norm uses.
            xf = x.astype(jnp.float32)
            mean32 = jnp.mean(xf, axis=axes)
            var32 = jnp.maximum(
                jnp.mean(xf * xf, axis=axes) - mean32 * mean32, 0.0)
            mean = mean32.astype(x.dtype)
            var = var32.astype(x.dtype)
            n = x.shape[0] * x.shape[1] * x.shape[2]
            unbiased = var * (n / max(n - 1, 1))
            m = self.momentum
            state = dict(state)
            state[rm_key] = (1 - m) * state[rm_key] + m * mean
            state[rv_key] = (1 - m) * state[rv_key] + m * unbiased
            state[nb_key] = state[nb_key] + 1
        else:
            mean = state[rm_key]
            var = state[rv_key]
        y = (x - mean) * lax.rsqrt(var + self.eps)
        if self.affine:
            y = y * params[join(prefix, "weight")] + params[join(prefix, "bias")]
        return y, state
