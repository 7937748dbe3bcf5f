"""Conv model factories: simple CNNs and PreAct ResNets
(reference: `bnn_priors/models/conv_nets.py`).

Networks accept torch-layout inputs (flat vectors or NCHW images) and
compute in NHWC internally (TPU-native layout).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import priors as prior
from .base import ClassificationModel, Module
from .dense_nets import LinearPrior
from .layers import (AvgPool2d, BatchNorm2d, Conv2d, Flatten, Identity,
                     MaxPool2d, ReLU, Sequential, to_nhwc)
from ..priors.base import join

__all__ = ("Conv2dPrior", "ClassificationConvNet",
           "CorrelatedClassificationConvNet", "PreActBlock", "PreActResNet",
           "PreActResNet18", "PreActResNet34", "ThinPreActResNet18")


def Conv2dPrior(in_channels, out_channels, kernel_size=3, stride=1, padding=0,
                dilation=1, groups=1, prior_w=prior.Normal, loc_w=0.0,
                std_w=1.0, prior_b=prior.Normal, loc_b=0.0, std_b=1.0,
                scaling_fn=None, weight_prior_params={}, bias_prior_params={}):
    """Conv layer whose weight std scales as std_w/sqrt(in_channels)
    (reference conv_nets.py:18-34 scales by channels, not fan-in)."""
    if scaling_fn is None:
        def scaling_fn(std, dim):
            return std / dim ** 0.5
    ks = (kernel_size, kernel_size) if isinstance(kernel_size, int) else tuple(kernel_size)
    bias_prior = (prior_b((out_channels,), 0.0, std_b, **bias_prior_params)
                  if prior_b is not None else None)
    return Conv2d(
        weight_prior=prior_w((out_channels, in_channels // groups, ks[0], ks[1]),
                             loc_w, scaling_fn(std_w, in_channels),
                             **weight_prior_params),
        bias_prior=bias_prior, stride=stride, padding=padding,
        dilation=dilation, groups=groups)


class _ImageInput(Module):
    "Reshape flat/NCHW input to NHWC images."

    def __init__(self, in_channels, img_height):
        super().__init__()
        self.in_channels = in_channels
        self.img_height = img_height

    def apply(self, params, state, prefix, x, train=False):
        if x.ndim == 2:
            x = x.reshape(-1, self.in_channels, self.img_height, self.img_height)
        return to_nhwc(x), state


def ClassificationConvNet(in_channels, img_height, out_features, width,
                          depth=3, softmax_temp=1.0, prior_w=prior.Normal,
                          loc_w=0.0, std_w=2 ** 0.5, prior_b=prior.Normal,
                          loc_b=0.0, std_b=1.0, scaling_fn=None,
                          weight_prior_params={}, bias_prior_params={}):
    "conv-relu-maxpool ×(depth-1) + linear (reference conv_nets.py:46-70)."
    assert depth >= 2, "We can't have less than two layers"
    kw = dict(prior_w=prior_w, loc_w=loc_w, std_w=std_w, prior_b=prior_b,
              loc_b=loc_b, std_b=std_b, scaling_fn=scaling_fn,
              weight_prior_params=weight_prior_params,
              bias_prior_params=bias_prior_params)
    layers = [_ImageInput(in_channels, img_height),
              Conv2dPrior(in_channels, width, kernel_size=3, padding=1, **kw),
              ReLU(), MaxPool2d(2)]
    for _ in range(depth - 2):
        layers += [Conv2dPrior(width, width, kernel_size=3, padding=1, **kw),
                   ReLU(), MaxPool2d(2)]
    layers.append(Flatten())
    reshaped_size = width * (img_height // 2 ** (depth - 1)) ** 2
    layers.append(LinearPrior(reshaped_size, out_features, prior_w=prior_w,
                              loc_w=loc_w, std_w=std_w, prior_b=prior_b,
                              loc_b=loc_b, std_b=std_b, scaling_fn=scaling_fn,
                              weight_prior_params=weight_prior_params,
                              bias_prior_params=bias_prior_params))
    return ClassificationModel(Sequential(*layers), softmax_temp)


def CorrelatedClassificationConvNet(in_channels, img_height, out_features,
                                    width, depth=3, softmax_temp=1.0,
                                    prior_w=prior.Normal, loc_w=0.0,
                                    std_w=2 ** 0.5, prior_b=prior.Normal,
                                    loc_b=0.0, std_b=1.0, scaling_fn=None,
                                    weight_prior_params={}, bias_prior_params={}):
    """Same topology; conv weights get `prior_w` (e.g. ConvCorrelatedNormal)
    with per-layer lengthscales, the dense layer a plain Normal
    (reference conv_nets.py:73-113)."""
    assert depth >= 2
    conv_prior_w = prior_w
    dense_prior_w = prior.Normal
    wp1 = {}
    if "lengthscale_1" in weight_prior_params:
        wp1["lengthscale"] = weight_prior_params["lengthscale_1"]
    wp2 = {}
    if "lengthscale_2" in weight_prior_params:
        wp2["lengthscale"] = weight_prior_params["lengthscale_2"]
    dense_params = {k: v for k, v in weight_prior_params.items()
                    if k not in ("lengthscale_1", "lengthscale_2")}

    kw = dict(loc_w=loc_w, std_w=std_w, prior_b=prior_b, loc_b=loc_b,
              std_b=std_b, scaling_fn=scaling_fn,
              bias_prior_params=bias_prior_params)
    layers = [_ImageInput(in_channels, img_height),
              Conv2dPrior(in_channels, width, kernel_size=3, padding=1,
                          prior_w=conv_prior_w, weight_prior_params=wp1, **kw),
              ReLU(), MaxPool2d(2)]
    for _ in range(depth - 2):
        layers += [Conv2dPrior(width, width, kernel_size=3, padding=1,
                               prior_w=conv_prior_w, weight_prior_params=wp2, **kw),
                   ReLU(), MaxPool2d(2)]
    layers.append(Flatten())
    reshaped_size = width * (img_height // 2 ** (depth - 1)) ** 2
    layers.append(LinearPrior(reshaped_size, out_features, prior_w=dense_prior_w,
                              loc_w=loc_w, std_w=std_w, prior_b=prior_b,
                              loc_b=loc_b, std_b=std_b, scaling_fn=scaling_fn,
                              weight_prior_params=dense_params,
                              bias_prior_params=bias_prior_params))
    return ClassificationModel(Sequential(*layers), softmax_temp)


class PreActBlock(Module):
    "Pre-activation BasicBlock (reference conv_nets.py:118-158)."
    expansion = 1

    def __init__(self, in_planes, planes, stride=1, bn=True,
                 prior_w=prior.Normal, loc_w=0.0, std_w=2 ** 0.5,
                 prior_b=prior.Normal, loc_b=0.0, std_b=1.0,
                 scaling_fn=None, weight_prior_params={}, bias_prior_params={}):
        super().__init__()
        batchnorm = BatchNorm2d if bn else (lambda c: Identity())
        kw = dict(prior_w=prior_w, loc_w=loc_w, std_w=std_w, prior_b=None,
                  scaling_fn=scaling_fn, weight_prior_params=weight_prior_params,
                  bias_prior_params=bias_prior_params)
        self.bn1 = batchnorm(in_planes)
        self.conv1 = Conv2dPrior(in_planes, planes, kernel_size=3,
                                 stride=stride, padding=1, **kw)
        self.bn2 = batchnorm(planes)
        self.conv2 = Conv2dPrior(planes, planes, kernel_size=3, stride=1,
                                 padding=1, **kw)
        self.has_shortcut = stride != 1 or in_planes != self.expansion * planes
        if self.has_shortcut:
            self.shortcut = Sequential(
                Conv2dPrior(in_planes, self.expansion * planes, kernel_size=1,
                            stride=stride, **kw))

    def apply(self, params, state, prefix, x, train=False):
        out, state = self.bn1.apply(params, state, join(prefix, "bn1"), x, train)
        out = jax.nn.relu(out)
        if self.has_shortcut:
            shortcut, state = self.shortcut.apply(
                params, state, join(prefix, "shortcut"), out, train)
        else:
            shortcut = x
        out, state = self.conv1.apply(params, state, join(prefix, "conv1"), out, train)
        out2, state = self.bn2.apply(params, state, join(prefix, "bn2"), out, train)
        out, state = self.conv2.apply(
            params, state, join(prefix, "conv2"), jax.nn.relu(out2), train)
        return out + shortcut, state


class PreActResNet(Module):
    def __init__(self, block, num_blocks, num_classes=10, bn=True,
                 prior_w=prior.Normal, loc_w=0.0, std_w=2 ** 0.5,
                 prior_b=prior.Normal, loc_b=0.0, std_b=1.0,
                 in_planes=64, scaling_fn=None,
                 weight_prior_params={}, bias_prior_params={}):
        super().__init__()
        self.in_planes = in_planes
        kw = dict(bn=bn, prior_w=prior_w, loc_w=loc_w, std_w=std_w,
                  prior_b=prior_b, loc_b=loc_b, std_b=std_b,
                  scaling_fn=scaling_fn, weight_prior_params=weight_prior_params,
                  bias_prior_params=bias_prior_params)

        if prior_w in (prior.ConvCorrelatedNormal, prior.FixedCovNormal):
            dense_prior_w = prior.Normal
        elif prior_w is prior.FixedCovGenNorm:
            dense_prior_w = prior.GenNorm
        else:
            dense_prior_w = prior_w

        self.conv1 = Conv2dPrior(3, in_planes, kernel_size=3, stride=1,
                                 padding=1, prior_b=None, prior_w=prior_w,
                                 loc_w=loc_w, std_w=std_w, scaling_fn=scaling_fn,
                                 weight_prior_params=weight_prior_params,
                                 bias_prior_params=bias_prior_params)
        self.layer1 = self._make_layer(block, in_planes, num_blocks[0], 1, kw)
        self.layer2 = self._make_layer(block, 2 * in_planes, num_blocks[1], 2, kw)
        self.layer3 = self._make_layer(block, 4 * in_planes, num_blocks[2], 2, kw)
        self.layer4 = self._make_layer(block, 8 * in_planes, num_blocks[3], 2, kw)
        self.linear = LinearPrior(8 * in_planes, num_classes,
                                  prior_w=dense_prior_w, loc_w=loc_w,
                                  std_w=std_w, prior_b=prior_b, loc_b=loc_b,
                                  std_b=std_b, scaling_fn=scaling_fn,
                                  weight_prior_params=weight_prior_params,
                                  bias_prior_params=bias_prior_params)

    def _make_layer(self, block, planes, num_blocks, stride, kw):
        strides = [stride] + [1] * (num_blocks - 1)
        layers = []
        for s in strides:
            layers.append(block(self.in_planes, planes, s, **kw))
            self.in_planes = planes * block.expansion
        return Sequential(*layers)

    def apply(self, params, state, prefix, x, train=False):
        out = to_nhwc(x)
        out, state = self.conv1.apply(params, state, join(prefix, "conv1"), out, train)
        for name in ("layer1", "layer2", "layer3", "layer4"):
            out, state = getattr(self, name).apply(
                params, state, join(prefix, name), out, train)
        out = jnp.mean(out, axis=(1, 2))  # == avg_pool2d(4) on the 4x4 map
        out, state = self.linear.apply(params, state, join(prefix, "linear"), out, train)
        return out, state


def PreActResNet18(softmax_temp=1.0, width=64, prior_w=prior.Normal,
                   loc_w=0.0, std_w=2 ** 0.5, prior_b=prior.Normal, loc_b=0.0,
                   std_b=1.0, scaling_fn=None, bn=True,
                   weight_prior_params={}, bias_prior_params={}):
    load_file_keys = ["lengthscale_dict_file"]
    load_file = {k: v for k, v in weight_prior_params.items() if k in load_file_keys}
    weight_prior_params = {k: v for k, v in weight_prior_params.items()
                           if k not in load_file_keys}
    model = ClassificationModel(
        PreActResNet(PreActBlock, [2, 2, 2, 2], bn=bn, prior_w=prior_w,
                     loc_w=loc_w, std_w=std_w, prior_b=prior_b, loc_b=loc_b,
                     std_b=std_b, scaling_fn=scaling_fn, in_planes=width,
                     weight_prior_params=weight_prior_params,
                     bias_prior_params=bias_prior_params),
        softmax_temp)
    if "lengthscale_dict_file" in load_file:
        from .data_driven import load_lengthscales
        load_lengthscales(model, load_file["lengthscale_dict_file"])
    return model


def ThinPreActResNet18(softmax_temp=1.0, prior_w=prior.Normal, loc_w=0.0,
                       std_w=2 ** 0.5, prior_b=prior.Normal, loc_b=0.0,
                       std_b=1.0, scaling_fn=None, bn=True,
                       weight_prior_params={}, bias_prior_params={}):
    return PreActResNet18(softmax_temp, 16, prior_w, loc_w, std_w, prior_b,
                          loc_b, std_b, scaling_fn, bn, weight_prior_params,
                          bias_prior_params)


def PreActResNet34(softmax_temp=1.0, prior_w=prior.Normal, loc_w=0.0,
                   std_w=2 ** 0.5, prior_b=prior.Normal, loc_b=0.0, std_b=1.0,
                   scaling_fn=None, bn=True, weight_prior_params={},
                   bias_prior_params={}):
    return ClassificationModel(
        PreActResNet(PreActBlock, [3, 4, 6, 3], bn=bn, prior_w=prior_w,
                     loc_w=loc_w, std_w=std_w, prior_b=prior_b, loc_b=loc_b,
                     std_b=std_b, scaling_fn=scaling_fn,
                     weight_prior_params=weight_prior_params,
                     bias_prior_params=bias_prior_params),
        softmax_temp)
