"""Reference-named module alias: ``HyGrid.HexImage`` -> hygrid_tpu."""
from .image.image import HEXIMAGE

__all__ = ["HEXIMAGE"]
