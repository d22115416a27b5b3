"""Hex neural-network ops and layers (layer L3)."""
from . import functional
from .functional import (
    pad2d,
    hex_kernel_num,
    scatter_hex_kernel,
    hex_conv2d,
    hex_conv2d_adaptive_padding,
    hex_conv2d_output_shape,
    hex_pool2d,
    hex_adaptive_pool2d,
    hex_global_pool2d,
    max_pooling,
    min_pooling,
    average_pooling,
)
from .layers import (
    HexConv2d,
    HexConv2dAdaptivePadding,
    HexConvStack,
    HexPool2d,
    HexAdaptivePool2d,
    HexGlobalPool2d,
)

__all__ = [
    "functional",
    "pad2d",
    "hex_kernel_num",
    "scatter_hex_kernel",
    "hex_conv2d",
    "hex_conv2d_adaptive_padding",
    "hex_conv2d_output_shape",
    "hex_pool2d",
    "hex_adaptive_pool2d",
    "hex_global_pool2d",
    "max_pooling",
    "min_pooling",
    "average_pooling",
    "HexConv2d",
    "HexConv2dAdaptivePadding",
    "HexConvStack",
    "HexPool2d",
    "HexAdaptivePool2d",
    "HexGlobalPool2d",
]
