"""Reference-named module alias: ``HyGrid.HexFrames`` -> hygrid_tpu.

Lets reference code port by changing only the import root::

    from hygrid_tpu import HexFrames      # was: from HyGrid import HexFrames

Classes are flax modules (init/apply instead of torch call); function
names and semantics match (see DIVERGENCES.md for the documented fixes).
"""
from .nn.functional import (pad2d as pad, hex_kernel_num, hex_conv2d,
                            hex_pool2d, max_pooling, min_pooling,
                            average_pooling)
from .nn.layers import (HexConv2d, HexConv2dAdaptivePadding, HexPool2d,
                        HexAdaptivePool2d, HexGlobalPool2d)
from .ops.convert import (heximage_to_type1, heximage_to_type2,
                          type1_to_heximage)

__all__ = [
    "pad", "hex_kernel_num", "hex_conv2d", "hex_pool2d",
    "max_pooling", "min_pooling", "average_pooling",
    "HexConv2d", "HexConv2dAdaptivePadding", "HexPool2d",
    "HexAdaptivePool2d", "HexGlobalPool2d",
    "heximage_to_type1", "heximage_to_type2", "type1_to_heximage",
]
