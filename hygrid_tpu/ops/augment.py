"""Hex-native data augmentation (jit/vmap-safe, batched, random).

The reference ships no augmentation at all (its training is withheld);
rect-lattice augmentations (90-degree rots, arbitrary crops) are WRONG on
brick-wall hex storage — a 90-degree rotation is not a lattice symmetry and
an odd-row crop silently flips the even/odd parity every op assumes.  This
module provides the augmentations the hex lattice actually supports:

* exact 60-degree rotations about a cell (lattice automorphisms — pure
  permutations, no interpolation; see :mod:`.hexrot`), same-canvas form;
* horizontal/vertical mirrors (pure index reversals);
* parity-preserving random translations (row shifts restricted to even
  offsets so offset-0 storage stays offset-0).

Everything is driven by ``jax.random`` keys and shaped for ``(B, C, H, W)``
batches: per-image random parameters, one fused gather for the whole batch
where possible.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .hexrot import _axial_of, _offset_of, _rot_axial

__all__ = ["hexrot60_same", "random_hexrot60", "random_hexflip",
           "random_hex_translate", "augment_hex_batch"]

_SAME_PLAN_CACHE: dict = {}


def _rot_maps_same(h: int, w: int, pivot: Optional[Tuple[int, int]]):
    """(6, H, W) int32 flat source index + (6, H, W) float32 validity for
    all six same-canvas rotations (inverse-mapped: output cell -> source
    cell), built once per (h, w, pivot) in numpy at trace time."""
    key = (h, w, pivot)
    if key not in _SAME_PLAN_CACHE:
        ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        q, r = _axial_of(ii, jj)
        pi, pj = pivot if pivot is not None else (h // 2, w // 2)
        qc, rc = _axial_of(np.array(pi), np.array(pj))
        idxs, valids = [], []
        for k in range(6):
            qs, rs = _rot_axial(q - qc, r - rc, -k)     # inverse rotation
            si, sj = _offset_of(qs + qc, rs + rc)
            valid = (si >= 0) & (si < h) & (sj >= 0) & (sj < w)
            idxs.append(np.where(valid, si * w + sj, 0))
            valids.append(valid)
        if len(_SAME_PLAN_CACHE) > 32:
            _SAME_PLAN_CACHE.pop(next(iter(_SAME_PLAN_CACHE)))
        _SAME_PLAN_CACHE[key] = (np.stack(idxs).astype(np.int32),
                                 np.stack(valids).astype(np.float32))
    return _SAME_PLAN_CACHE[key]


def hexrot60_same(image, k, pivot: Optional[Tuple[int, int]] = None):
    """Rotate a hex image (..., H, W) by ``k * 60`` degrees EXACTLY, on the
    SAME canvas (cells rotated outside it become zero; cells with no
    rotated source are zero).  Unlike :func:`hexrot60` the output shape
    equals the input shape, so it composes with batching — and ``k`` may be
    a TRACED integer (augmentation draws it from a PRNG key).

    Integer dtypes are preserved exactly (pure permutation + zero fill).

    Why this bypasses the SamplePlan engine (CLAUDE.md convention): a plan
    is chosen at trace time, but augmentation's ``k`` is a traced random
    draw — the op must select among the six precomputed index maps inside
    the program.  Rotation plans are not row-separable (a rotated row spans
    many source rows), so even the static-k path (:func:`hexrot60`)
    executes as an XLA gather; this traced-k form does the same work with
    the map selection fused in.  For static ``k`` prefer :func:`hexrot60`.
    """
    image = jnp.asarray(image)
    h, w = image.shape[-2:]
    idx6, val6 = _rot_maps_same(h, w, pivot)
    k = jnp.asarray(k) % 6
    idx = jnp.asarray(idx6)[k].reshape(-1)
    val = jnp.asarray(val6)[k]
    flat = image.reshape(image.shape[:-2] + (h * w,))
    out = jnp.take(flat, idx, axis=-1).reshape(image.shape)
    if jnp.issubdtype(image.dtype, jnp.floating):
        return out * val.astype(image.dtype)
    return jnp.where(val.astype(bool), out, jnp.zeros((), image.dtype))


def random_hexrot60(key, images, pivot: Optional[Tuple[int, int]] = None):
    """Per-image uniform rotation by 0..5 sixths of a turn.

    images: (B, ...) hex storage; returns the same shape/dtype.
    """
    images = jnp.asarray(images)
    ks = jax.random.randint(key, (images.shape[0],), 0, 6)
    return jax.vmap(lambda x, k: hexrot60_same(x, k, pivot))(images, ks)


def random_hexflip(key, images, p: float = 0.5, axis: str = "horizontal"):
    """Per-image Bernoulli(p) mirror (exact permutation)."""
    images = jnp.asarray(images)
    flip = jax.random.bernoulli(key, p, (images.shape[0],))
    if axis == "horizontal":
        flipped = images[..., :, ::-1]
    elif axis == "vertical":
        flipped = images[..., ::-1, :]
    else:
        raise ValueError(axis)
    return jnp.where(flip.reshape((-1,) + (1,) * (images.ndim - 1)),
                     flipped, images)


def random_hex_translate(key, images, max_shift: int = 2):
    """Per-image random translation with zero fill, parity-preserving:
    row shifts are restricted to EVEN offsets in [-2*max_shift, 2*max_shift]
    (an odd row shift would flip the brick-wall parity and silently change
    the meaning of every downstream conv's ``even_odd_offset``); column
    shifts are free in [-max_shift, max_shift].
    """
    images = jnp.asarray(images)
    b = images.shape[0]
    kr, kc = jax.random.split(key)
    dy = 2 * jax.random.randint(kr, (b,), -max_shift, max_shift + 1)
    dx = jax.random.randint(kc, (b,), -max_shift, max_shift + 1)

    def shift_one(x, dy, dx):
        zero = jnp.zeros((), x.dtype)
        h, w = x.shape[-2:]
        rows = jnp.arange(h)[:, None] - dy
        cols = jnp.arange(w)[None, :] - dx
        valid = ((rows >= 0) & (rows < h) & (cols >= 0) & (cols < w))
        gathered = x[..., jnp.clip(rows, 0, h - 1).squeeze(-1), :] \
            [..., :, jnp.clip(cols, 0, w - 1).squeeze(0)]
        return jnp.where(valid, gathered, zero)

    return jax.vmap(shift_one)(images, dy, dx)


def augment_hex_batch(key, images, *, rotate: bool = True,
                      flip: bool = True, translate: int = 0,
                      pivot: Optional[Tuple[int, int]] = None):
    """Standard hex training augmentation: random 60-degree rotation +
    random horizontal mirror (together: the full 12-element dihedral
    symmetry group of the hex lattice) + optional parity-preserving random
    translation.  One key in, batch out; composes under jit."""
    images = jnp.asarray(images)
    k1, k2, k3 = jax.random.split(key, 3)
    if rotate:
        images = random_hexrot60(k1, images, pivot)
    if flip:
        images = random_hexflip(k2, images)
    if translate:
        images = random_hex_translate(k3, images, translate)
    return images
