"""Flax module wrappers for the hex NN ops (layer L3).

Rebuild of the ``torch.nn.Module`` classes in ``HexFrames.py`` as
``flax.linen`` modules (convs, with parameters) and lightweight callable
classes (pooling, parameter-free) whose constructor signatures mirror the
reference for 1:1 porting.
"""
from __future__ import annotations

import math
from typing import Optional, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from . import functional as F

__all__ = [
    "HexConv2d",
    "HexConv2dAdaptivePadding",
    "HexConvStack",
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
    dtype: jnp.dtype = None     # compute dtype; None = promote with input
                                # (flax convention: f32 master params make
                                # the conv compute f32 unless dtype is set)

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
        kernel, bias = self.kernel, self.bias
        if self.dtype is not None:
            kernel = kernel.astype(self.dtype)
            if bias is not None:
                bias = bias.astype(self.dtype)
        return F.hex_conv2d(
            x, kernel, bias,
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


class HexConvStack(nn.Module):
    """A uniform-width chain of 'same' hex conv (+ GroupNorm) (+ ReLU)
    layers executed by the packed-domain Pallas stack kernel.

    This is the model-layer on-ramp to the framework's fastest conv path
    (``kernels/conv_pallas.py::hex_conv_stack_pallas``): the whole chain —
    every conv, norm and activation — runs in the packed even/odd-row
    domain with one pack and one unpack, instead of paying the
    NCHW<->packed transposes once per ``HexConvModule``.  Semantically it
    equals ``depth`` chained ``HexConvModule(norm_cfg=GN, act=ReLU)``
    modules of the same width (tested, forward and grad).

    The reference slot is the conv-bundle layer users build models from
    (``HexModules.py:97-288``); chaining those bundles was the measured
    bottleneck of the r2 metric of record (VERDICT r2 weak #1).

    Layer 0 maps ``in_channels -> width``; all later layers are
    ``width -> width``.  When ``in_channels < width`` the input rides the
    stack zero-channel-padded (extra input channels read zero weights — bit
    equal to the narrow conv, costing FLOPs only on layer 0).

    Off the kernel envelope (odd image height, ``128 % width != 0``,
    ``in_channels > width``, non-zero input offset) the module runs the
    numerically-equal per-op XLA chain instead, so it is always safe to
    use.

    Args:
        in_channels / width: channel plan (see above).
        depth: number of conv layers.
        hexkernel_radius: hex kernel radius (padding is ``radius - 1``,
            i.e. 'same').
        norm: ``"GN"`` (fused GroupNorm, ``gcd(num_groups, width)`` groups,
            matching ``HexConvModule``'s GN cfg) or ``None``.
        final_activation: apply the trailing ReLU of the last layer.
        dtype: compute/storage dtype of the stack (params stay
            ``param_dtype``).
    """

    in_channels: int
    width: int
    depth: int
    even_odd_offset: int = 0
    hexkernel_radius: int = 2
    dilation: int = 1
    norm: Optional[str] = "GN"
    num_groups: int = 8
    activation: Optional[str] = "relu"
    final_activation: bool = True
    use_bias: Union[bool, str] = "auto"
    batch_group: Optional[int] = None
    min_cells: int = 1024
    data_format: str = "NCHW"
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.norm not in (None, "GN"):
            raise ValueError(
                f"HexConvStack supports norm None or 'GN', got {self.norm!r}"
                " (train-mode BatchNorm needs cross-batch state; use"
                " HexConvModule, or fold inference BN with norms="
                "('affine', ...) on hex_conv_stack_pallas directly)")
        if self.activation not in (None, "none", "relu"):
            raise ValueError("HexConvStack fuses only ReLU (or None)")
        bias = self.use_bias
        if bias == "auto":  # bias unnecessary before a norm
            bias = self.norm is None
        self.with_bias = bool(bias)
        kn = F.hex_kernel_num(self.hexkernel_radius)
        kernels, biases, gammas, betas = [], [], [], []
        for li in range(self.depth):
            cin = self.in_channels if li == 0 else self.width
            fan_in = cin * kn
            kernels.append(self.param(
                f"kernel_{li}", _kaiming_hex_init(fan_in),
                (self.width, cin, kn), self.param_dtype))
            if self.with_bias:
                biases.append(self.param(
                    f"bias_{li}", _kaiming_hex_init(fan_in),
                    (self.width,), self.param_dtype))
            if self.norm == "GN":
                gammas.append(self.param(
                    f"gn_scale_{li}", nn.initializers.ones,
                    (self.width,), self.param_dtype))
                betas.append(self.param(
                    f"gn_bias_{li}", nn.initializers.zeros,
                    (self.width,), self.param_dtype))
        self.kernels = kernels
        self.biases = biases
        self.gammas = gammas
        self.betas = betas

    @property
    def gn_groups(self) -> int:
        return math.gcd(self.num_groups, self.width)

    def _stack_applicable(self, x) -> bool:
        hh, ww = ((x.shape[1], x.shape[2])
                  if self.data_format == "NHWC" else x.shape[-2:])
        w_ok = self.width <= 128 and 128 % self.width == 0
        if not (w_ok and self.even_odd_offset == 0
                and hh % 2 == 0
                and self.in_channels <= self.width):
            return False
        # per-batch-element packed matmul M-dim: tiny images (e.g. the
        # hex-CIFAR 16^2 case, M=32 rows) run FASTER on the per-op mxu
        # path — measured on v5e: hex-CIFAR HexCNN dropped 74-86k ->
        # 67k img/s when tiny stages rode the stack.  min_cells=0 forces
        # the stack (tests use it to exercise the kernel at small sizes).
        q = 128 // self.width
        m_elem = (hh // 2) * (-(-ww // q))
        return m_elem >= self.min_cells

    def __call__(self, x, *, packed_io: bool = False,
                 image_width: Optional[int] = None, extra=None):
        from ..kernels.conv_pallas import hex_conv_stack_pallas
        if extra is not None:
            return self._call_split(x, extra)
        if packed_io:
            # x is the (xe, xo) margined-plane pair, packed at
            # q = 128 // width (zero extra channel slots when
            # in_channels < width — e.g. straight out of
            # hex_packed_maxpool2).  Whole model stages chain in this
            # domain with no per-stage pack/unpack (PERF.md r3).
            if image_width is None:
                raise ValueError("packed_io=True requires image_width")
            dtype = self.dtype or x[0].dtype
            planes = tuple(jnp.asarray(p, dtype) for p in x)
            kernels = [jnp.asarray(k, dtype) for k in self.kernels]
            if self.in_channels < self.width:
                kernels[0] = jnp.pad(
                    kernels[0],
                    ((0, 0), (0, self.width - self.in_channels), (0, 0)))
            biases = ([jnp.asarray(b, dtype) for b in self.biases]
                      if self.with_bias else None)
            norms = None
            if self.norm == "GN":
                norms = [("gn", self.gn_groups, g, b)
                         for g, b in zip(self.gammas, self.betas)]
            return hex_conv_stack_pallas(
                planes, kernels, biases, radius=self.hexkernel_radius,
                even_odd_offset=0, dilation=self.dilation,
                activation="relu" if self.activation == "relu" else None,
                final_activation=self.final_activation,
                batch_group=self.batch_group, norms=norms,
                packed_io=True, image_width=image_width,
                in_channels=self.width)
        x = jnp.asarray(x)
        while x.ndim < 4:
            x = x[None]
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        relu = self.activation == "relu"
        kernels = [jnp.asarray(k, dtype) for k in self.kernels]
        biases = ([jnp.asarray(b, dtype) for b in self.biases]
                  if self.with_bias else [None] * self.depth)
        norms = None
        if self.norm == "GN":
            norms = [("gn", self.gn_groups, g, b)
                     for g, b in zip(self.gammas, self.betas)]

        nhwc = self.data_format == "NHWC"
        if self._stack_applicable(x):
            if self.in_channels < self.width:
                pad_c = self.width - self.in_channels
                cpad = (((0, 0),) * 3 + ((0, pad_c),)) if nhwc else \
                    ((0, 0), (0, pad_c), (0, 0), (0, 0))
                x = jnp.pad(x, cpad)
                kernels[0] = jnp.pad(
                    kernels[0], ((0, 0), (0, pad_c), (0, 0)))
            return hex_conv_stack_pallas(
                x, kernels, biases if self.with_bias else None,
                radius=self.hexkernel_radius, even_odd_offset=0,
                dilation=self.dilation,
                activation="relu" if relu else None,
                final_activation=self.final_activation,
                batch_group=self.batch_group, norms=norms,
                data_format=self.data_format)

        # numerically-equal per-op fallback (off the kernel envelope)
        h = jnp.moveaxis(x, -1, 1) if nhwc else x
        h = self._per_op_chain(h, kernels, biases)
        return jnp.moveaxis(h, 1, -1) if nhwc else h

    def _per_op_chain(self, h, kernels, biases):
        """The numerically-equal per-op chain on NCHW data (off-envelope
        fallback of both the plain and the split entry)."""
        from ..kernels.conv_pallas import _group_norm_nchw
        relu = self.activation == "relu"
        for li in range(self.depth):
            h = F.hex_conv2d(
                h, kernels[li], biases[li],
                even_odd_offset=self.even_odd_offset if li == 0 else 0,
                radius=self.hexkernel_radius, padding=self.hexkernel_radius - 1,
                dilation=self.dilation, impl="auto")
            if self.norm == "GN":
                h = _group_norm_nchw(h, self.gn_groups,
                                     jnp.asarray(self.gammas[li], jnp.float32),
                                     jnp.asarray(self.betas[li], jnp.float32))
            if relu and (self.final_activation or li < self.depth - 1):
                h = jnp.maximum(h, 0)
        return h

    def _call_split(self, x, extra):
        """Skip-join stage: the chain applied to the channel concatenation
        ``concat([x, extra])`` (``in_channels`` counts BOTH inputs — the
        UNet decoder's upsample+skip -> 2W -> W stage).  When both halves
        carry exactly ``width`` channels the concat is never materialised:
        layer 0 runs as the fused ``conv(A, Ka) + conv(B, Kb)`` split
        inside the packed Pallas kernel (``extra_input=``)."""
        from ..kernels.conv_pallas import hex_conv_stack_pallas
        nhwc = self.data_format == "NHWC"
        cax = -1 if nhwc else 1
        x = jnp.asarray(x)
        extra = jnp.asarray(extra)
        ca, cb = x.shape[cax], extra.shape[cax]
        if ca + cb != self.in_channels:
            raise ValueError(
                f"split inputs carry {ca}+{cb} channels; the stage was "
                f"built for in_channels={self.in_channels}")
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        extra = extra.astype(dtype)
        kernels = [jnp.asarray(k, dtype) for k in self.kernels]
        biases = ([jnp.asarray(b, dtype) for b in self.biases]
                  if self.with_bias else [None] * self.depth)
        norms = None
        if self.norm == "GN":
            norms = [("gn", self.gn_groups, g, b)
                     for g, b in zip(self.gammas, self.betas)]
        hh = x.shape[1 if nhwc else 2]
        ww = x.shape[2 if nhwc else 3]
        w_ok = self.width <= 128 and 128 % self.width == 0
        m_elem = (hh // 2) * (-(-ww // (128 // self.width)) if w_ok else 0)
        if (w_ok and ca == cb == self.width and hh % 2 == 0
                and self.even_odd_offset == 0
                and m_elem >= self.min_cells):
            return hex_conv_stack_pallas(
                x, kernels, biases if self.with_bias else None,
                radius=self.hexkernel_radius, even_odd_offset=0,
                dilation=self.dilation,
                activation="relu" if self.activation == "relu" else None,
                final_activation=self.final_activation,
                batch_group=self.batch_group, norms=norms,
                data_format=self.data_format, extra_input=extra)
        h = jnp.concatenate([x, extra], axis=cax)
        h = jnp.moveaxis(h, -1, 1) if nhwc else h
        h = self._per_op_chain(h, kernels, biases)
        return jnp.moveaxis(h, 1, -1) if nhwc else h


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
