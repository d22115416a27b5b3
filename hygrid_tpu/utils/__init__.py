"""Utilities: native IO runtime bindings, profiling, checkpointing,
AOT model export."""
from .native_loader import (
    NativeTileLoader, write_raw_raster, read_raw_raster, native_available,
    RawRasterSpec)
from .profiling import annotate, device_timer, benchmark, get_logger
from .checkpoint import save_checkpoint, restore_checkpoint, HAS_ORBAX
from .export import export_fn, export_inference, load_exported, exported_info

__all__ = [
    "export_fn",
    "export_inference",
    "load_exported",
    "exported_info",
    "NativeTileLoader",
    "write_raw_raster",
    "read_raw_raster",
    "native_available",
    "RawRasterSpec",
    "annotate",
    "device_timer",
    "benchmark",
    "get_logger",
    "save_checkpoint",
    "restore_checkpoint",
    "HAS_ORBAX",
]
