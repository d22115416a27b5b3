"""Reference-named module alias: ``HyGrid.geometry_np`` -> hygrid_tpu.

The reference keeps three near-identical geometry backends; here every
alias resolves to the single jit engine (XLA places it on the active
backend). Outputs match the numpy reference within 1e-5 (golden-tested).
"""
from .compat import (image_geometric_transformation, hex_to_rect_resample,
                     rect_to_hex_resample, hexresize)
from .ops.pad import heximpad, hex_impad_to_multiple

__all__ = [
    "image_geometric_transformation", "hex_to_rect_resample",
    "rect_to_hex_resample", "hexresize", "heximpad",
    "hex_impad_to_multiple",
]
