"""hygrid_tpu — TPU-native hybrid hexagonal/rectangular image processing.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Tesla-Albert/Hybrid-Grid-for-Hexagonal-and-Rectangular-Image-Processing
("HyGrid"), designed TPU-first: static shapes, trace-time resampling plans,
fused gathers, MXU-friendly hex convolutions and mesh-sharded execution.

Unlike the reference (whose ``__init__`` files are empty and force submodule
imports), this package curates a public namespace.
"""
from . import lattice
from . import compat  # noqa: F401  (reference API shims)
from . import nn  # noqa: F401
from . import models  # noqa: F401
from . import parallel  # noqa: F401
from . import viz  # noqa: F401
from . import utils  # noqa: F401
from .image import IMAGE, HEXIMAGE
from .lattice import HexSpec
from .ops import (
    image_geometric_transformation,
    hex_to_rect_resample,
    rect_to_hex_resample,
    hexresize,
    warp_output_shape,
    heximpad,
    hex_impad_to_multiple,
    heximage_to_type1,
    heximage_to_type2,
    type1_to_heximage,
    type2_to_heximage,
)
from .ops.hexrot import hexrot60, hexflip
from .ops.augment import (hexrot60_same, random_hexrot60, random_hexflip,
                          random_hex_translate, augment_hex_batch)

__version__ = "0.1.0"

__all__ = [
    "lattice",
    "compat",
    "nn",
    "models",
    "parallel",
    "viz",
    "utils",
    "IMAGE",
    "HEXIMAGE",
    "HexSpec",
    "image_geometric_transformation",
    "hex_to_rect_resample",
    "rect_to_hex_resample",
    "hexresize",
    "warp_output_shape",
    "heximpad",
    "hex_impad_to_multiple",
    "heximage_to_type1",
    "heximage_to_type2",
    "type1_to_heximage",
    "type2_to_heximage",
    "hexrot60",
    "hexflip",
    "hexrot60_same",
    "random_hexrot60",
    "random_hexflip",
    "random_hex_translate",
    "augment_hex_batch",
]
