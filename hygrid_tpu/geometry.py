"""Reference-named module alias: ``HyGrid.geometry`` (numba backend) ->
hygrid_tpu.  The per-channel CUDA launch loop is gone; one fused call
covers all channels (see kernels/resample_pallas.py)."""
from .compat import (image_geometric_transformation,
                     image_geometric_transformation_gpu,
                     image_geometric_transformation_cpu,
                     hex_to_square_resample, hexresize)

__all__ = [
    "image_geometric_transformation",
    "image_geometric_transformation_gpu",
    "image_geometric_transformation_cpu",
    "hex_to_square_resample", "hexresize",
]
