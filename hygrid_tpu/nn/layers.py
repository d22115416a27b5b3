"""Flax module wrappers for the hex NN ops (layer L3).

Rebuild of the ``torch.nn.Module`` classes in ``HexFrames.py`` as
``flax.linen`` modules (convs, with parameters) and lightweight callable
classes (pooling, parameter-free) whose constructor signatures mirror the
reference for 1:1 porting.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from . import functional as F

__all__ = [
    "HexConv2d",
    "HexConv2dAdaptivePadding",
    "HexPool2d",
    "HexAdaptivePool2d",
    "HexGlobalPool2d",
]


def _kaiming_hex_init(fan_in):
    """torch ``kaiming_uniform_(a=sqrt(5))`` on the flat hex kernel
    (``HexFrames.py:89-95``): bound = 1/sqrt(fan_in)."""
    def init(key, shape, dtype):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class HexConv2d(nn.Module):
    """Hexagonal convolution (``HexFrames.py:22-185``).

    Parameters follow the reference constructor; ``bias`` is renamed
    ``use_bias`` per flax convention.  The learned parameter is the flat hex
    kernel ``(out_channels, in_channels // groups, kernelnum)`` with
    ``kernelnum = 3r^2 - 3r + 1``.
    """

    in_channels: int
    out_channels: int
    even_odd_offset: int
    hexkernel_radius: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    padding_mode: str = "constant"
    padding_value: float = 0.0
    impl: str = "auto"
    param_dtype: jnp.dtype = jnp.float32

    @property
    def kernelnum(self) -> int:
        return F.hex_kernel_num(self.hexkernel_radius)

    @property
    def out_even_odd_offset(self) -> int:
        return 0  # HexFrames.py:56

    def setup(self):
        if self.in_channels % self.groups:
            raise ValueError("in_channels must be divisible by groups")
        if self.out_channels % self.groups:
            raise ValueError("out_channels must be divisible by groups")
        fan_in = (self.in_channels // self.groups) * self.kernelnum
        self.kernel = self.param(
            "kernel", _kaiming_hex_init(fan_in),
            (self.out_channels, self.in_channels // self.groups, self.kernelnum),
            self.param_dtype)
        if self.use_bias:
            self.bias = self.param(
                "bias", _kaiming_hex_init(fan_in), (self.out_channels,),
                self.param_dtype)
        else:
            self.bias = None

    def __call__(self, x):
        return F.hex_conv2d(
            x, self.kernel, self.bias,
            even_odd_offset=self.even_odd_offset,
            radius=self.hexkernel_radius, stride=self.stride,
            padding=self.padding, dilation=self.dilation, groups=self.groups,
            padding_mode=self.padding_mode, padding_value=self.padding_value,
            impl=self.impl)


class HexConv2dAdaptivePadding(HexConv2d):
    """TF-"same" adaptive padding variant (``HexFrames.py:187-253``).

    Faithful quirks: the ``padding`` argument is accepted but DISCARDED (the
    reference ctor forwards ``padding=0`` and never stores the user value,
    ``HexFrames.py:219-227``), and the width rule ``output_w * stride``
    (not ``output_w - 1``) makes stride-1 outputs one column wider than the
    input (``HexFrames.py:244-246``).
    """

    def __call__(self, x):
        return F.hex_conv2d_adaptive_padding(
            x, self.kernel, self.bias,
            even_odd_offset=self.even_odd_offset,
            radius=self.hexkernel_radius, stride=self.stride,
            dilation=self.dilation, groups=self.groups, impl=self.impl)


class HexPool2d:
    """Strided hex pooling (``HexFrames.py:255-341``). Parameter-free; a
    plain callable so it works inside or outside flax modules.

    Divergence: ``stride=None`` defaults to ``kernel_size`` as documented —
    the reference crashes on it (``HexFrames.py:277`` re-assigns the
    original ``None``).
    """

    def __init__(self, method: str, kernel_size=2, stride=None, padding=0,
                 even_odd_offset=0, padding_mode="constant", padding_value=0,
                 ceil_mode: bool = False, count_include_pad: bool = True,
                 divisor_override: Optional[int] = None):
        self.method = method
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.even_odd_offset = even_odd_offset
        self.padding_mode = padding_mode
        self.padding_value = padding_value
        self.ceil_mode = ceil_mode
        self.count_include_pad = count_include_pad
        self.out_offset = 0
        F._reduction(method)  # validate eagerly, like the reference ctor

    def __call__(self, x):
        return F.hex_pool2d(
            x, self.method, kernel_size=self.kernel_size, stride=self.stride,
            padding=self.padding, even_odd_offset=self.even_odd_offset,
            padding_mode=self.padding_mode, padding_value=self.padding_value,
            ceil_mode=self.ceil_mode, count_include_pad=self.count_include_pad)

    def __repr__(self):
        return (f"HexPool2d(kernel_size={self.kernel_size}, "
                f"stride={self.stride}, padding={self.padding})")


class HexAdaptivePool2d:
    """Adaptive output-size pooling (``HexFrames.py:344-401``).

    Divergences: constructible at all (the reference's methods dict eagerly
    references the undefined ``centroid_pooling`` so EVERY instantiation
    raises NameError, ``HexFrames.py:357-360``), and (h, w) outsizes are
    accepted as documented.
    """

    def __init__(self, outsize, method: str, padding=0,
                 padding_mode="constant", padding_value=0):
        self.outsize = outsize
        self.method = method
        F._reduction(method)

    def __call__(self, x):
        return F.hex_adaptive_pool2d(x, self.outsize, self.method)


class HexGlobalPool2d:
    """Global pooling over flattened spatial dims (``HexFrames.py:402-414``);
    same constructibility fix as :class:`HexAdaptivePool2d`."""

    def __init__(self, method: str):
        self.method = method
        F._reduction(method)

    def __call__(self, x):
        return F.hex_global_pool2d(x, self.method)
