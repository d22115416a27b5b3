"""HexConvModule and cfg-dict builders (rebuild of ``HexModules.py``).

The reference rides on the mmcv registry/builder machinery
(``HexModules.py:7-16,22-91``).  This rebuild keeps the same cfg-dict API
surface — ``dict(type='HexConv2d', ...)`` consumed by ``build_hexconv_layer``,
``dict(type='BN')`` norm cfgs, ``dict(type='ReLU')`` act cfgs — over a small
self-contained registry, with flax modules underneath (no mmcv/torch).

All modules operate channel-first (B, C, H, W), like the hex ops.
"""
from __future__ import annotations

import warnings
from typing import Dict, Mapping, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from . import functional as F
from .layers import (HexConv2d, HexConv2dAdaptivePadding,
                     HexConvStack)

__all__ = [
    "CONV_LAYERS",
    "register_conv_layer",
    "build_hexconv_layer",
    "build_hexnorm_layer",
    "build_hexactivation_layer",
    "build_hexpadding_layer",
    "HexConvModule",
]

# ----------------------------- registries -----------------------------

CONV_LAYERS: Dict[str, type] = {}


def register_conv_layer(name: str, module: Optional[type] = None):
    """Register a conv layer class under a cfg ``type`` name (the shim for
    mmcv's ``CONV_LAYERS.register_module``, ``HexModules.py:16``)."""
    def _register(cls):
        CONV_LAYERS[name] = cls
        return cls
    if module is not None:
        return _register(module)
    return _register


register_conv_layer("HexConv2d", HexConv2d)
register_conv_layer("HexConv2dAdaptivePadding", HexConv2dAdaptivePadding)
register_conv_layer("HexConvStack", HexConvStack)


def build_hexconv_layer(cfg: Optional[Dict], *args, **kwargs):
    """Build a conv layer from a cfg dict (``HexModules.py:22-54``).

    Positional args follow the reference call convention:
    ``(in_channels, out_channels, even_odd_offset, hexkernel_radius)``.
    """
    if cfg is None:
        cfg_ = dict(type="HexConv2d")
    else:
        if not isinstance(cfg, Mapping):
            raise TypeError("cfg must be a dict")
        if "type" not in cfg:
            raise KeyError('the cfg dict must contain the key "type"')
        cfg_ = dict(cfg)
    layer_type = cfg_.pop("type")
    if layer_type not in CONV_LAYERS:
        raise KeyError(f"Unrecognized layer type {layer_type}")
    conv_layer = CONV_LAYERS[layer_type]
    names = ("in_channels", "out_channels", "even_odd_offset",
             "hexkernel_radius")
    kwargs = {**dict(zip(names, args)), **kwargs, **cfg_}
    if "bias" in kwargs:  # torch name -> flax name
        kwargs["use_bias"] = kwargs.pop("bias")
    return conv_layer(**kwargs)


# ------------------------------- norms --------------------------------


class _ChannelFirstNorm(nn.Module):
    """Adapter: run a channels-last flax norm over (B, C, H, W) data."""

    norm_type: str
    num_features: int
    eps: float = 1e-5
    momentum: float = 0.9
    num_groups: int = 32
    affine: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.norm_type == "BN":
            norm = nn.BatchNorm(use_running_average=not train, axis=1,
                                momentum=self.momentum, epsilon=self.eps,
                                use_bias=self.affine, use_scale=self.affine)
            return norm(x)
        xl = jnp.moveaxis(x, 1, -1)
        if self.norm_type == "GN":
            import math as _math
            groups = _math.gcd(self.num_groups, self.num_features)
            xl = nn.GroupNorm(num_groups=groups, epsilon=self.eps,
                              use_bias=self.affine, use_scale=self.affine)(xl)
        elif self.norm_type == "LN":
            xl = nn.LayerNorm(epsilon=self.eps, use_bias=self.affine,
                              use_scale=self.affine)(xl)
        elif self.norm_type == "IN":
            mean = jnp.mean(xl, axis=(1, 2), keepdims=True)
            var = jnp.var(xl, axis=(1, 2), keepdims=True)
            xl = (xl - mean) * jax.lax.rsqrt(var + self.eps)
            if self.affine:
                scale = self.param("scale", nn.initializers.ones,
                                   (self.num_features,))
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.num_features,))
                xl = xl * scale + bias
        else:
            raise KeyError(f"Unrecognized norm type {self.norm_type}")
        return jnp.moveaxis(xl, -1, 1)


_NORM_ABBR = {"BN": "bn", "SyncBN": "bn", "GN": "gn", "LN": "ln", "IN": "in"}


def build_hexnorm_layer(cfg: Dict, num_features: int,
                        postfix: Union[int, str] = "") -> Tuple[str, nn.Module]:
    """Build a normalization layer; returns ``(name, module)`` like mmcv
    (``HexModules.py:69-89``).  ``SyncBN`` maps to plain BatchNorm — with
    jit over a device mesh, XLA computes batch statistics globally, so the
    distinction is moot on TPU."""
    if not isinstance(cfg, Mapping) or "type" not in cfg:
        raise TypeError('cfg must be a dict containing the key "type"')
    cfg_ = dict(cfg)
    layer_type = cfg_.pop("type")
    cfg_.pop("requires_grad", None)
    if layer_type not in _NORM_ABBR:
        raise KeyError(f"Unrecognized norm type {layer_type}")
    name = _NORM_ABBR[layer_type] + str(postfix)
    norm_type = "BN" if layer_type == "SyncBN" else layer_type
    mod = _ChannelFirstNorm(norm_type=norm_type, num_features=num_features,
                            **cfg_)
    return name, mod


# ---------------------------- activations -----------------------------

_ACTIVATIONS = {
    "ReLU": lambda cfg: nn.relu,
    "ReLU6": lambda cfg: (lambda x: jnp.clip(x, 0, 6)),
    "LeakyReLU": lambda cfg: (lambda x: nn.leaky_relu(
        x, negative_slope=cfg.get("negative_slope", 0.01))),
    "ELU": lambda cfg: nn.elu,
    "Sigmoid": lambda cfg: nn.sigmoid,
    "HSigmoid": lambda cfg: nn.hard_sigmoid,
    "Tanh": lambda cfg: nn.tanh,
    "GELU": lambda cfg: nn.gelu,
    "Swish": lambda cfg: nn.silu,
    "SiLU": lambda cfg: nn.silu,
    "PReLU": lambda cfg: nn.PReLU(
        param_dtype=jnp.float32,
        negative_slope_init=cfg.get("init", 0.25)),
}


def build_hexactivation_layer(cfg: Dict):
    """Build an activation from a cfg dict (``HexModules.py:90-91``).
    Returns a callable (a flax module only for parametric activations)."""
    if not isinstance(cfg, Mapping) or "type" not in cfg:
        raise TypeError('cfg must be a dict containing the key "type"')
    cfg_ = dict(cfg)
    t = cfg_.pop("type")
    cfg_.pop("inplace", None)  # meaningless under XLA
    if t not in _ACTIVATIONS:
        raise KeyError(f"Unrecognized activation type {t}")
    return _ACTIVATIONS[t](cfg_)


# ------------------------------ padding -------------------------------

_PADDING_MODES = {"zero": "constant", "zeros": "constant",
                  "reflect": "reflect", "replicate": "replicate"}


def build_hexpadding_layer(cfg: Dict, padding):
    """Build an explicit padding callable (``HexModules.py:56-67``)."""
    if not isinstance(cfg, Mapping) or "type" not in cfg:
        raise TypeError('cfg must be a dict containing the key "type"')
    t = cfg["type"]
    if t not in _PADDING_MODES:
        raise KeyError(f"Unrecognized padding type {t}")
    mode = _PADDING_MODES[t]
    return lambda x: F.pad2d(x, padding, mode)


# ---------------------------- HexConvModule ---------------------------


class HexConvModule(nn.Module):
    """Conv/norm/activation bundle (``HexModules.py:97-288``).

    Supports bias='auto', explicit padding layers, arbitrary
    conv/norm/act ordering, and spectral norm on the conv kernel.
    ``__call__(x, activate=True, norm=True, train=False)`` mirrors the
    reference forward flags plus flax's train-mode flag for BatchNorm.
    """

    in_channels: int
    out_channels: int
    even_odd_offset: int
    hexkernel_radius: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    bias: Union[bool, str] = "auto"
    conv_cfg: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None
    act_cfg: Union[Dict, None, str] = "default"  # "default" -> ReLU, None -> none
    inplace: bool = True
    with_spectral_norm: bool = False
    padding_mode: str = "zeros"
    order: tuple = ("conv", "norm", "act")

    def _act_cfg(self):
        # flax dataclass fields can't default to a mutable dict, so the
        # reference's ``act_cfg=dict(type='ReLU')`` default is spelled with
        # the "default" sentinel; explicit None disables activation as in
        # the reference.
        return dict(type="ReLU") if self.act_cfg == "default" else self.act_cfg

    @property
    def with_norm(self) -> bool:
        return self.norm_cfg is not None

    @property
    def with_activation(self) -> bool:
        return self._act_cfg() is not None

    def setup(self):
        assert self.conv_cfg is None or isinstance(self.conv_cfg, Mapping)
        assert self.norm_cfg is None or isinstance(self.norm_cfg, Mapping)
        official_padding_mode = ("zeros", "circular")
        self.with_explicit_padding = (
            self.padding_mode not in official_padding_mode)
        assert isinstance(self.order, tuple) and len(self.order) == 3
        assert set(self.order) == {"conv", "norm", "act"}

        bias = self.bias
        if bias == "auto":  # bias unnecessary before a norm (HexModules.py:180-182)
            bias = not self.with_norm
        self.with_bias = bias
        if bias and self.with_norm:
            warnings.warn("Unnecessary conv bias before batch/instance norm")

        if self.with_explicit_padding:
            self.padding_layer = build_hexpadding_layer(
                dict(type=self.padding_mode), self.padding)
        conv_padding = 0 if self.with_explicit_padding else self.padding

        conv = build_hexconv_layer(
            self.conv_cfg,
            self.in_channels, self.out_channels,
            self.even_odd_offset, self.hexkernel_radius,
            stride=self.stride, padding=conv_padding,
            dilation=self.dilation, groups=self.groups, use_bias=bias)
        if self.with_spectral_norm:
            conv = nn.SpectralNorm(conv)
        self.conv = conv

        if self.with_norm:
            if self.order.index("norm") > self.order.index("conv"):
                norm_channels = self.out_channels
            else:
                norm_channels = self.in_channels
            self.norm_name, self.norm = build_hexnorm_layer(
                self.norm_cfg, norm_channels)
        else:
            self.norm_name = None

        if self.with_activation:
            self.activate = build_hexactivation_layer(self._act_cfg())

    def __call__(self, x, activate: bool = True, norm: bool = True,
                 train: bool = False):
        for layer in self.order:
            if layer == "conv":
                if self.with_explicit_padding:
                    x = self.padding_layer(x)
                if self.with_spectral_norm:
                    x = self.conv(x, update_stats=train)
                else:
                    x = self.conv(x)
            elif layer == "norm" and norm and self.with_norm:
                x = self.norm(x, train=train)
            elif layer == "act" and activate and self.with_activation:
                x = self.activate(x)
        return x
