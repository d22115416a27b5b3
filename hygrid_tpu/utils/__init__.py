"""Utilities: native IO runtime bindings, profiling helpers."""
from .native_loader import (
    NativeTileLoader, write_raw_raster, read_raw_raster, native_available,
    RawRasterSpec)

__all__ = [
    "NativeTileLoader",
    "write_raw_raster",
    "read_raw_raster",
    "native_available",
    "RawRasterSpec",
]
