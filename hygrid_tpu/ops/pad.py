"""Hex-aware padding utilities.

Rebuild of ``geometry_np.py:683-749`` (``heximpad`` / ``hex_impad_to_multiple``)
without the cv2 dependency, on jnp.

Reference bugs fixed (SURVEY.md section 4 item 3):
  * missing ``import numbers`` (``geometry_np.py:700,708``) — we use
    isinstance checks on numeric ABCs properly;
  * the 2-tuple padding branch computed ``padding[0]-padding[0]`` (i.e. 0)
    for the left pad (``geometry_np.py:707``); intent is symmetric
    ``(left, top, right, bottom) = (p0, p1, p0, p1)``.
"""
from __future__ import annotations

import numbers
from typing import List, Optional, Tuple, Union

import jax.numpy as jnp

__all__ = ["heximpad", "hex_impad_to_multiple"]

_BORDER = {
    "constant": "constant",
    "edge": "edge",
    "reflect": "reflect",     # cv2.BORDER_REFLECT_101
    "symmetric": "symmetric",  # cv2.BORDER_REFLECT
}


def heximpad(img, *, shape: Optional[Tuple[int, int]] = None,
             padding: Union[int, tuple, None] = None,
             pad_val: Union[float, List] = 0,
             padding_mode: str = "constant"):
    """Pad a (H, W) or (H, W, C) image with hex-parity-preserving rows.

    The brick-wall layout only keeps its parity when the number of rows added
    on top is even, so the reference moves any odd top row to the bottom:
    ``top = padding[1] - padding[1] % 2``, ``bottom = padding[3] +
    padding[1] % 2`` (``geometry_np.py:723-730``).  ``padding`` is cv2-order
    ``(left, top, right, bottom)``.
    """
    img = jnp.asarray(img)
    assert (shape is not None) ^ (padding is not None)
    if shape is not None:
        width = max(shape[1] - img.shape[1], 0)
        height = max(shape[0] - img.shape[0], 0)
        padding = (0, 0, width, height)

    if isinstance(pad_val, tuple):
        assert len(pad_val) == img.shape[-1]
    elif not isinstance(pad_val, numbers.Number):
        raise TypeError("pad_val must be a int or a tuple. "
                        f"But received {type(pad_val)}")

    if isinstance(padding, tuple) and len(padding) in (2, 4):
        if len(padding) == 2:
            padding = (padding[0], padding[1], padding[0], padding[1])
    elif isinstance(padding, numbers.Number):
        padding = (padding, padding, padding, padding)
    else:
        raise ValueError("Padding must be a int or a 2, or 4 element tuple."
                         f"But received {padding}")

    if padding_mode not in _BORDER:
        raise AssertionError(f"unsupported padding_mode {padding_mode!r}")

    top = padding[1] - padding[1] % 2
    bottom = padding[3] + padding[1] % 2
    left, right = padding[0], padding[2]

    pad_width = [(top, bottom), (left, right)] + [(0, 0)] * (img.ndim - 2)
    if padding_mode == "constant":
        if isinstance(pad_val, tuple):
            chans = [jnp.pad(img[..., c], pad_width[:2], mode="constant",
                             constant_values=pad_val[c])
                     for c in range(img.shape[-1])]
            return jnp.stack(chans, axis=-1)
        return jnp.pad(img, pad_width, mode="constant", constant_values=pad_val)
    return jnp.pad(img, pad_width, mode=_BORDER[padding_mode])


def hex_impad_to_multiple(img, divisor: int, pad_val: Union[float, List] = 0):
    """Pad so each spatial edge is a multiple of ``divisor``
    (``geometry_np.py:734-749``)."""
    import math
    pad_h = int(math.ceil(img.shape[0] / divisor)) * divisor
    pad_w = int(math.ceil(img.shape[1] / divisor)) * divisor
    return heximpad(img, shape=(pad_h, pad_w), pad_val=pad_val)
