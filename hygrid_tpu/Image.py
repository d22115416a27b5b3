"""Reference-named module alias: ``HyGrid.Image`` -> hygrid_tpu."""
from .image.image import IMAGE

__all__ = ["IMAGE"]
