"""Hex storage-format conversions (type-1 / type-2 packings).

Rebuild of ``HexFrames.py:417-458`` (tensor path) and
``HexImage.py:139-170`` (per-row numpy loops), fully vectorised on jnp.

Type-1 ("double-optimized coordinates"): every hex pixel duplicated x2 along
width; rows are alternately indented by one column; final width ``2W + 1``.
Type-2: type-1 with every row additionally duplicated x2 (visualisation
format).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "heximage_to_type1",
    "heximage_to_type2",
    "type1_to_heximage",
    "type2_to_heximage",
]


def _atleast_4d(x):
    x = jnp.asarray(x)
    while x.ndim < 4:
        x = x[None]
    return x


def heximage_to_type1(input, even_odd_offset: int):
    """Pack a hex image (B, C, H, W) into type-1 (B, C, H, 2W+1).

    Row ``i`` places hex pixel ``j`` at columns ``2j + q`` and ``2j + 1 + q``
    with ``q = (i + even_odd_offset) % 2`` (cf. ``HexFrames.py:417-445``:
    odd lines are prepended ``(1+offset)%2`` zeros, even lines
    ``(0+offset)%2``).
    """
    x = _atleast_4d(input)
    b, c, h, w = x.shape
    doubled = jnp.repeat(x, 2, axis=3)                      # (b,c,h,2w)
    padded = jnp.pad(doubled, ((0, 0), (0, 0), (0, 0), (1, 1)))  # (b,c,h,2w+2)
    q = (jnp.arange(h) + even_odd_offset) % 2               # per-row indent
    # row i occupies columns [1+q_i-1 ... ]: slice a (2w+1) window starting
    # at 1-q_i of the (2w+2) padded row -> start 0 when indented, 1 when not
    col = jnp.arange(2 * w + 1)[None, :] + (q[:, None] ^ 1)
    return jnp.take_along_axis(padded, col[None, None], axis=3)


def heximage_to_type2(input, even_odd_offset: int):
    """Type-2 = type-1 with rows duplicated x2 (``HexFrames.py:446-449``)."""
    t1 = heximage_to_type1(input, even_odd_offset)
    return jnp.repeat(t1, 2, axis=2)


def type1_to_heximage(input, even_odd_offset: int):
    """Inverse pack: take columns ``1::2`` (``HexFrames.py:450-458``).
    Returns ``(heximage, even_odd_offset)`` like the reference."""
    x = _atleast_4d(input)
    return x[:, :, :, 1::2], even_odd_offset


def type2_to_heximage(input, even_odd_offset: int):
    """Inverse of type-2: rows ``::2`` then columns ``1::2``
    (cf. the load path ``HexImage.py:72-84``)."""
    x = _atleast_4d(input)
    return x[:, :, ::2, 1::2], even_odd_offset
