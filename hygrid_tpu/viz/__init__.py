"""Visualisation layer (L5): mosaic renderer + offscreen viewer shell."""
from .render import ViewState, mosaic_plan, render_mosaic
from .pixelart import Texture, Window

__all__ = ["ViewState", "mosaic_plan", "render_mosaic", "Texture", "Window"]
