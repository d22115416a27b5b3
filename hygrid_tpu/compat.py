"""Reference API compatibility shims.

One-to-one name mapping so code written against the reference's modules
ports by changing only imports:

=====================================  =====================================
reference                              hygrid_tpu
=====================================  =====================================
``geometry_np.image_geometric_transformation``  ``compat.image_geometric_transformation``
``geometry_np.hex_to_rect_resample``   ``compat.hex_to_rect_resample``
``geometry_np.rect_to_hex_resample``   ``compat.rect_to_hex_resample``
``geometry_np.hexresize``              ``compat.hexresize``
``geometry_np.heximpad``               ``compat.heximpad``
``geometry_np.hex_impad_to_multiple``  ``compat.hex_impad_to_multiple``
``geometry_torch.hex_to_square_resample``  ``compat.hex_to_square_resample``
``geometry_torch.image_geometric_transformation_gpu`` / ``geometry.*_gpu``
                                       ``compat.image_geometric_transformation_gpu``
``geometry.image_geometric_transformation_cpu``  ``compat.image_geometric_transformation_cpu``
``HexFrames.*`` (classes/fns)          ``hygrid_tpu.nn`` (same names)
``HexModules.*``                       ``hygrid_tpu.nn.modules``
``Image.IMAGE`` / ``HexImage.HEXIMAGE``  ``hygrid_tpu.image``
``HexPixelArt.window/texture``         ``hygrid_tpu.viz.pixelart``
=====================================  =====================================

The device-suffixed variants exist in the reference only because it keeps
three numerical backends (``geometry_np/torch/numba`` — SURVEY.md C1-C7);
here there is ONE jit engine, so every alias points at the same function:
XLA places it on whatever backend is active, and the ``device=`` argument
of the torch dispatcher (``geometry_torch.py:447-475``) is accepted and
ignored.
"""
from __future__ import annotations

import numpy as np

from .ops.geometry import (
    image_geometric_transformation,
    hex_to_rect_resample,
    rect_to_hex_resample,
    hexresize,
)
from .ops.pad import heximpad, hex_impad_to_multiple
from .ops.convert import (
    heximage_to_type1, heximage_to_type2, type1_to_heximage)
from .image import IMAGE, HEXIMAGE

__all__ = [
    "image_geometric_transformation",
    "image_geometric_transformation_gpu",
    "image_geometric_transformation_cpu",
    "hex_to_rect_resample",
    "hex_to_square_resample",
    "rect_to_hex_resample",
    "hexresize",
    "heximpad",
    "hex_impad_to_multiple",
    "heximage_to_type1",
    "heximage_to_type2",
    "type1_to_heximage",
    "IMAGE",
    "HEXIMAGE",
]


def hex_to_square_resample(hex_image, rect_dsize=None,
                           interpolation="nearest", offset=0, device=None):
    """torch-backend name for hex->rect (``geometry_torch.py:296-446``);
    returns numpy like the reference's ``.cpu().numpy()`` tail."""
    return np.asarray(hex_to_rect_resample(hex_image, rect_dsize,
                                           interpolation, offset))


def image_geometric_transformation_gpu(image, H=None, interpolation="nearest",
                                       offset=0, device=None):
    """GPU-suffixed warp (``geometry_torch.py:7-295``, ``geometry.py:156``);
    one engine here — the suffix only fixes the return type to numpy."""
    return np.asarray(image_geometric_transformation(image, H, interpolation,
                                                     offset))


def image_geometric_transformation_cpu(image, H=None, interpolation="nearest",
                                       offset=0):
    """CPU fallback name (``geometry.py:354-435``; the torch one at
    ``geometry_torch.py:360-366`` is broken upstream)."""
    return np.asarray(image_geometric_transformation(image, H, interpolation,
                                                     offset))
