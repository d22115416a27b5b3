"""Raster codecs with geo-metadata (layer L4 backend).

The reference hard-exits when GDAL/mmcv/cv2 are missing (``Image.py:4-27``,
``HexImage.py:13-40``).  This rebuild is dependency-tolerant: PIL is the
default backend (reads/writes TIFF incl. GeoTIFF tags, PNG, JPEG), cv2 is
optional, and a pure-numpy ``.npy``/``.heximg`` path always works.

GeoTIFF support covers what the reference actually uses: the gdal-style
geotransform ``(x0, dx, rx, y0, ry, dy)`` round-trips through the
ModelPixelScale (33550) + ModelTiepoint (33922) tags, and the projection
string through GeoAsciiParams (34737).
"""
from __future__ import annotations

import os
import pickle
from typing import Optional, Tuple

import numpy as np

try:
    from PIL import Image as PILImage
    from PIL.TiffImagePlugin import ImageFileDirectory_v2
    HAS_PIL = True
except ImportError:  # pragma: no cover
    HAS_PIL = False

try:
    import cv2
    HAS_CV2 = True
except ImportError:  # pragma: no cover
    HAS_CV2 = False

__all__ = [
    "read_raster", "write_raster", "read_heximg", "write_heximg",
    "HAS_PIL", "HAS_CV2",
]

_MODEL_PIXEL_SCALE = 33550
_MODEL_TIEPOINT = 33922
_GEO_ASCII = 34737

RASTER_EXTS = (".tif", ".tiff", ".jpg", ".jpeg", ".png", ".bmp")


def _geotrans_from_tags(tags) -> Optional[Tuple[float, ...]]:
    try:
        scale = tags[_MODEL_PIXEL_SCALE]
        tie = tags[_MODEL_TIEPOINT]
    except KeyError:
        return None
    sx, sy = float(scale[0]), float(scale[1])
    # tiepoint: (i, j, k, x, y, z) raster->model
    i, j = float(tie[0]), float(tie[1])
    x, y = float(tie[3]), float(tie[4])
    return (x - i * sx, sx, 0.0, y + j * sy, 0.0, -sy)


def read_raster(path: str, backend: str = "pil"):
    """Read a raster file -> ``(array (C, H, W), geotransform, projection)``.

    geotransform follows the gdal convention used throughout the reference
    (``Image.py:56``); None when the file carries no geo tags.
    """
    ext = os.path.splitext(path)[1].lower()
    if ext not in RASTER_EXTS:
        raise ValueError(f"unsupported raster extension {ext!r}")
    if backend == "cv2" and HAS_CV2:
        arr = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if arr is None:
            raise OSError(f"cv2 failed to read {path}")
        if arr.ndim == 3:
            arr = arr[:, :, ::-1]  # BGR -> RGB
        chw = np.ascontiguousarray(np.atleast_3d(arr).transpose(2, 0, 1))
        return chw, None, None
    if not HAS_PIL:
        raise ImportError("no raster backend available (PIL missing)")
    with PILImage.open(path) as im:
        geotrans = proj = None
        if ext in (".tif", ".tiff") and hasattr(im, "tag_v2"):
            geotrans = _geotrans_from_tags(im.tag_v2)
            proj = im.tag_v2.get(_GEO_ASCII)
            if isinstance(proj, tuple):
                proj = proj[0] if proj else None
        arr = np.asarray(im)
    if arr.ndim == 2:
        arr = arr[None]
    else:
        arr = np.ascontiguousarray(arr.transpose(2, 0, 1))
    return arr, geotrans, proj


def write_raster(path: str, array: np.ndarray,
                 geotrans: Optional[Tuple[float, ...]] = None,
                 proj: Optional[str] = None, backend: str = "pil",
                 compress: bool = True) -> None:
    """Write (C, H, W) to disk; TIFF gets LZW + geo tags like the
    reference's GDAL writer (``HexImage.py:198-208``)."""
    array = np.asarray(array)
    if array.ndim == 2:
        array = array[None]
    ext = os.path.splitext(path)[1].lower()
    hwc = np.ascontiguousarray(array.transpose(1, 2, 0))
    if hwc.shape[-1] == 1:
        hwc = hwc[..., 0]
    if backend == "cv2":
        if not HAS_CV2:
            raise ImportError("cv2 backend requested but unavailable")
        bgr = hwc[..., ::-1] if hwc.ndim == 3 else hwc
        if not cv2.imwrite(path, bgr):
            raise OSError(f"cv2 failed to write {path}")
        return
    if not HAS_PIL:
        raise ImportError("no raster backend available (PIL missing)")
    im = PILImage.fromarray(hwc)
    if ext in (".tif", ".tiff"):
        kwargs = {"compression": "tiff_lzw"} if compress else {}
        if geotrans is not None:
            x0, dx, _, y0, _, dy = geotrans
            ifd = ImageFileDirectory_v2()
            ifd[_MODEL_PIXEL_SCALE] = (float(abs(dx)), float(abs(dy)), 0.0)
            ifd[_MODEL_TIEPOINT] = (0.0, 0.0, 0.0, float(x0), float(y0), 0.0)
            if proj:
                ifd[_GEO_ASCII] = str(proj)
            kwargs["tiffinfo"] = ifd
        im.save(path, **kwargs)
    else:
        im.save(path)


def read_heximg(path: str) -> dict:
    """Load the reference's pickled ``.heximg`` container
    (``HexImage.py:89-102``) — byte-compatible with reference files."""
    with open(path, "rb") as f:
        return pickle.load(f)


def write_heximg(path: str, dataset: dict) -> None:
    with open(path, "wb") as f:
        pickle.dump(dataset, f)
