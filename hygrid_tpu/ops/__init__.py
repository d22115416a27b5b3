"""Geometry, resampling, padding and format-conversion ops (layer L2)."""
from .geometry import (
    image_geometric_transformation,
    hex_to_rect_resample,
    rect_to_hex_resample,
    hexresize,
    warp_output_shape,
)
from .pad import heximpad, hex_impad_to_multiple
from .convert import (
    heximage_to_type1,
    heximage_to_type2,
    type1_to_heximage,
    type2_to_heximage,
)
from .sampling import SamplePlan, hex_sample_plan, rect_sample_plan, apply_plan
from .hexrot import hexrot60, hexflip
from .augment import (hexrot60_same, random_hexrot60, random_hexflip,
                      random_hex_translate, augment_hex_batch)

__all__ = [
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
    "SamplePlan",
    "hex_sample_plan",
    "rect_sample_plan",
    "apply_plan",
    "hexrot60",
    "hexflip",
    "hexrot60_same",
    "random_hexrot60",
    "random_hexflip",
    "random_hex_translate",
    "augment_hex_batch",
]
