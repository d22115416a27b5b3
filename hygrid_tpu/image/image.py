"""IMAGE / HEXIMAGE raster classes (layer L4).

API-compatible rebuild of ``Image.py`` / ``HexImage.py`` without the
GDAL/mmcv hard dependency (the reference ``sys.exit()``s at import when any
of gdal/mmcv/cv2 is missing, ``Image.py:4-27`` — this build degrades
gracefully) and with the heavy paths running through the fused jax ops:

* ``ConvertToHexagon`` -> fused rect->hex gather plan (all bands at once);
* ``GenerateType1Image``/``GenerateType2Image`` -> vectorised packing
  (the reference loops per band per row in Python,
  ``HexImage.py:139-170``);
* ``Hex_imshow`` -> offscreen mosaic render (viz.render) instead of a GLFW
  window (headless TPU hosts have no GL swapchain);
* ``Tiles`` -> actually implemented (streaming tiled resample; the
  reference declares it and ``pass``es, ``Image.py:81-88``).
"""
from __future__ import annotations

import os
import warnings
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..ops import geometry, convert
from . import codecs

__all__ = ["IMAGE", "HEXIMAGE"]


class IMAGE:
    """Rectangular raster with geo metadata (rebuild of ``Image.py:39-159``).

    Attributes mirror the reference: ``Image`` (bands, H, W) array,
    ``height/width/bands/geotrans/proj/shape/path/backend``.
    """

    def __init__(self, pathname: Optional[str] = None, data=None,
                 geotrans=None, proj=None, backend: str = "pil",
                 lazy: bool = False):
        if pathname is None and data is None:
            raise ValueError("pathname and data can not be None at the same time")
        if pathname is not None and data is not None:
            raise ValueError("pathname and data can not be Given at the same time")
        self._reader = None
        if pathname is not None:
            self.path = pathname
            if not os.path.exists(pathname):
                raise OSError("path doesn't exist.")
            ext = os.path.splitext(pathname)[1].lower()
            if ext in codecs.RASTER_EXTS:
                self.filetype = 1
                if ext in (".tif", ".tiff") and backend != "cv2":
                    # out-of-core handle: window reads come straight from
                    # disk, like the reference's GDAL dataset
                    # (Image.py:52-57, 89-107)
                    try:
                        from .window import TiffWindowReader
                        self._reader = TiffWindowReader(pathname)
                    except (ValueError, OSError):
                        self._reader = None   # PIL-only TIFF variants
                if self._reader is not None:
                    self._full = None
                    self.geotrans = self._reader.geotrans
                    self.proj = self._reader.proj
                    self.bands, self.height, self.width = self._reader.shape
                else:
                    self._full, self.geotrans, self.proj = codecs.read_raster(
                        pathname,
                        backend if backend in ("pil", "cv2") else "pil")
                    self.bands, self.height, self.width = self._full.shape
                if self.geotrans is None:
                    self.geotrans = (0, 1, 0, 0, 0, 1)
                # `lazy=True` skips materialising the pixels (TPU-side
                # extension: the reference eagerly reads the full raster at
                # construction, Image.py:58); window reads / Tiles() then
                # stream from disk and `.Image` stays None until the first
                # full LoadImageArray().
                self.Image = None if (lazy and self._reader is not None) \
                    else self.LoadImageArray()
            else:
                raise ValueError(f"unsupported file type {ext!r}")
        else:
            data = np.asarray(data)
            if data.ndim == 2:
                data = data[None]
            self.Image = data
            self._full = data
            self.bands, self.height, self.width = data.shape
            self.geotrans = geotrans if geotrans is not None else (0, 1, 0, 0, 0, 1)
            self.proj = proj
            self.path = "tmp.tif"
        self.shape = (self.bands, self.height, self.width)
        self.backend = backend

    def size(self, index: int) -> int:
        return self.Image.shape[index]

    def LoadImageArray(self, w_range_start: int = 0, h_range_start: int = 0,
                       w_range: Optional[int] = None,
                       h_range: Optional[int] = None) -> np.ndarray:
        """Windowed read (``Image.py:89-107``); like the reference, updates
        height/width to the window size.  On a TIFF this is a true windowed
        **disk** read (only intersecting strips/tiles are pread+decoded,
        the reference's GDAL ``ReadAsArray`` behaviour); other formats
        window the in-RAM array.  ``w_range``/``h_range`` are END indices
        (matching the reference's width/height bookkeeping,
        ``Image.py:103-104`` — its size-vs-end mixup is resolved toward
        the bookkeeping; see DIVERGENCES.md)."""
        if w_range is None:
            w_range = self.width
        if h_range is None:
            h_range = self.height
        if self._reader is not None and self._full is None:
            out = self._reader.read_window(
                h_range_start, w_range_start,
                h_range - h_range_start, w_range - w_range_start)
        else:
            out = np.ascontiguousarray(
                self._full[:, h_range_start:h_range, w_range_start:w_range])
        self.width = w_range - w_range_start
        self.height = h_range - h_range_start
        return out

    def Tiles(self, tile: int = 2000):
        """Stream the raster as (row0, col0, array) tiles of ``tile``^2
        (implements the reference's declared-but-empty streaming interface,
        ``Image.py:81-88``).  With an open TIFF handle the tiles come
        straight from disk — a raster larger than RAM streams with peak
        memory ~ one tile + the reader's chunk cache."""
        if self._reader is not None and self._full is None:
            yield from self._reader.iter_tiles(tile)
            return
        for r0 in range(0, self.height, tile):
            for c0 in range(0, self.width, tile):
                yield r0, c0, self._full[:, r0:r0 + tile, c0:c0 + tile]

    def ConvertToHexagon(self, interpolation: str = "nearest") -> np.ndarray:
        """rect -> hex at half resolution (``Image.py:111-116``)."""
        return np.asarray(geometry.rect_to_hex_resample(
            self.Image, [self.height // 2, self.width // 2],
            interpolation=interpolation))

    def SaveImage(self, pathname: str) -> None:
        """Write the raster (fixes the reference's dead gdal branch that
        unconditionally raises, ``Image.py:130-136``)."""
        arr = self.Image
        if arr.dtype.kind == "f":
            arr = np.clip(arr, 0, 255).astype(np.uint8)
        elif "int16" in arr.dtype.name:
            arr = arr.astype(np.uint16)
        elif arr.dtype != np.uint8:
            arr = arr.astype(np.uint8)
        codecs.write_raster(pathname, arr, self.geotrans, self.proj,
                            backend="cv2" if self.backend == "cv2" else "pil")

    def imshow(self, save_to: Optional[str] = None):
        """Matplotlib display (``Image.py:152-159``); saves to file when
        headless or ``save_to`` given."""
        import matplotlib
        if save_to is not None:
            matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt
        image = self.Image.astype(np.uint8)
        if self.bands == 1:
            plt.imshow(image.squeeze(), cmap="gray")
        else:
            plt.imshow(image.transpose(1, 2, 0)[..., :3])
        if save_to is not None:
            plt.savefig(save_to)
            plt.close()
        else:
            plt.show()


class HEXIMAGE(IMAGE):
    """Hex raster (rebuild of ``HexImage.py:43-276``).

    ``heximagetype``: None = ordinary image (hexified on load), 1 = type-1
    packed file, 2 = type-2 packed file; ``.heximg`` = pickled container.
    """

    def __init__(self, pathname: Optional[str] = None,
                 heximagetype: Optional[int] = None, data=None,
                 geotrans=None, proj=None, even_odd_offset=False,
                 backend: str = "pil"):
        if pathname is None and data is None:
            raise ValueError("pathname and data can not be None at the same time")
        if pathname is not None and data is not None:
            raise ValueError("pathname and data can not be Given at the same time")

        if pathname is not None:
            ext = os.path.splitext(pathname)[1].lower()
            if ext in codecs.RASTER_EXTS:
                super().__init__(pathname, backend=backend)
                self.heximagetype = heximagetype
                if heximagetype is None:
                    self.HexagonImage = self.ConvertToHexagon()
                    self.bands, self.height, self.width = self.HexagonImage.shape
                elif heximagetype == 1:
                    tmp = self.LoadImageArray()
                    self.width = (self.width - 1) // 2
                    self.HexagonImage = np.ascontiguousarray(tmp[:, :, 1::2]).astype(float)
                elif heximagetype == 2:
                    tmp = self.LoadImageArray()
                    if (self.width & 1) == 0:
                        tmp = np.concatenate(
                            [tmp, np.zeros((self.bands, self.height, 1),
                                           tmp.dtype)], axis=2)
                        self.width += 1
                    self.height //= 2
                    self.width = (self.width - 1) // 2
                    self.HexagonImage = np.ascontiguousarray(
                        tmp[:, ::2, 1::2]).astype(float)
                else:
                    raise ValueError(
                        "unsupported heximagetype: None (ordinary image), "
                        "1 (type-1 packed) or 2 (type-2 packed)")
            elif ext == ".heximg":
                self.datapath = pathname
                self.Heximagedataset = codecs.read_heximg(pathname)
                self.filetype = 2
                self.height = self.Heximagedataset["height"]
                self.width = self.Heximagedataset["width"]
                self.bands = self.Heximagedataset["bands"]
                self.geotrans = self.Heximagedataset["geotransform"]
                self.proj = self.Heximagedataset["projection"]
                even_odd_offset = self.Heximagedataset["offset"]
                # materialise a writable owned array (a 2-D HexMatrix is a
                # single band — the band count stays what the file says, and
                # later in-place edits / SaveHexImage keep working; the
                # reference loads the matrix as-is, HexImage.py:89-102)
                hm = np.array(self.Heximagedataset["HexMatrix"])
                if hm.ndim == 2:
                    hm = hm[None]
                self.HexagonImage = hm
                self.bands, self.height, self.width = hm.shape
                self.path = pathname
                self.backend = backend
            else:
                raise ValueError(f"unsupported file type {ext!r}")
        else:
            data = np.asarray(data)
            if data.ndim == 2:
                data = data[None]
            if heximagetype is None:
                self.HexagonImage = data
            elif heximagetype == 1:
                self.HexagonImage = data[:, :, 1:-1:2]
            elif heximagetype == 2:
                self.HexagonImage = data[:, ::2, 1:-1:2]
            else:
                raise ValueError("heximagetype must be None, 1 or 2")
            self.bands, self.height, self.width = self.HexagonImage.shape
            self.geotrans = geotrans if geotrans is not None else (0, 1, 0, 0, 0, 1)
            self.proj = proj
            self.path = "data"
            self.backend = backend

        self.even_odd_offset = int(even_odd_offset)
        self.shape = (self.bands, self.height, self.width)

    def size(self, index: int) -> int:
        return self.HexagonImage.shape[index]

    def build_Heximagedataset(self) -> None:
        """Container dict with the exact reference keys
        (``HexImage.py:129-137``) so files interoperate."""
        self.Heximagedataset = {
            "height": self.height,
            "width": self.width,
            "bands": self.bands,
            "geotransform": self.geotrans,
            "projection": self.proj,
            "offset": self.even_odd_offset,
            "HexMatrix": self.HexagonImage,
        }

    def GenerateType1Image(self):
        """Vectorised type-1 pack (replaces the per-band per-row loop at
        ``HexImage.py:139-153``); returns ``(array, geotrans)`` with the
        same y-scale doubling."""
        t1 = np.asarray(convert.heximage_to_type1(
            self.HexagonImage[None], self.even_odd_offset))[0]
        g = self.geotrans
        return t1, (g[0], g[1], g[2], g[3], g[4], g[5] * 2)

    def GenerateType2Image(self):
        t2 = np.asarray(convert.heximage_to_type2(
            self.HexagonImage[None], self.even_odd_offset))[0]
        return t2, tuple(self.geotrans)

    def SaveHexImage(self, pathname: str, imagetype: int = 1,
                     filetype: int = 1) -> None:
        """Save as packed raster (type-1/2 GeoTIFF/PNG) or ``.heximg``
        pickle (``HexImage.py:171-218``)."""
        file_name, file_extension = os.path.splitext(pathname)
        if file_extension == ".heximg":
            filetype = 2
        if file_extension.lower() in (".tif", ".tiff", ".png", ".bmp"):
            self.filetype = 1
        if file_extension.lower() in (".jpg", ".jpeg"):
            warnings.warn("jpg and jpeg are lossy compression formats, "
                          "switching to png")
            file_extension = ".png"
        pathname = file_name + file_extension

        if filetype == 1:
            if imagetype == 1:
                tmp, geotrans_out = self.GenerateType1Image()
            else:
                tmp, geotrans_out = self.GenerateType2Image()
            if "int16" in np.asarray(self.HexagonImage).dtype.name:
                tmp = tmp.astype(np.uint16)
            else:
                tmp = tmp.astype(np.uint8)
            codecs.write_raster(
                pathname, tmp, geotrans_out, self.proj,
                backend="cv2" if self.backend == "cv2" else "pil")
        else:
            self.build_Heximagedataset()
            codecs.write_heximg(pathname, self.Heximagedataset)

    def Hex_imshow(self, out_size: Optional[Tuple[int, int]] = None,
                   view=None, save_to: Optional[str] = None):
        """Render the hexagon mosaic (``HexImage.py:219-276``) — offscreen
        via the fused mosaic plan; displays with matplotlib or writes
        ``save_to``.  Returns the rendered (C, H, W) uint8 frame."""
        from ..viz.render import render_mosaic
        if out_size is None:
            scale = max(1, int(1500 / max(self.height, self.width)))
            out_size = (2 * self.height * scale,
                        2 * self.width * scale)
        img = np.asarray(self.HexagonImage)
        if img.shape[0] == 1:
            img = np.repeat(img, 3, axis=0)  # texture.py:26-27
        frame = np.asarray(render_mosaic(
            jnp.asarray(img, jnp.float32), out_size, self.even_odd_offset))
        frame = np.clip(frame, 0, 255).astype(np.uint8)
        if save_to is not None:
            codecs.write_raster(save_to, frame)
        elif os.environ.get("DISPLAY"):
            import matplotlib.pyplot as plt
            plt.imshow(frame.transpose(1, 2, 0))
            plt.show()
        return frame
