"""HexViT: a vision transformer over brick-wall hex storage.

Beyond-parity model family (the reference ships no models at all —
``README.md:4-5`` defers experiments to a paper): the point of a ViT on
TPU is that after patch embedding EVERYTHING is dense matmul (pure MXU
work at pack ×1 — no lattice tax), so only the patch stem needs to be
hex-aware:

* patch embedding = a chain of stride-2 'same' hex convolutions (each
  halves both storage dims and keeps offset-0 parity), i.e. hexagonal
  super-cells of 4^k cells become one token — the lattice-correct
  analogue of ViT's p×p patchify;
* tokens then flow through standard pre-LN transformer blocks
  (``flax.linen.MultiHeadDotProductAttention``), mean-pool, linear head.

Positional information: a learned embedding per token position (the
brick-wall layout is baked into token order, so learned positions absorb
the odd-row half-cell offsets without any special casing).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.layers import HexConv2d

__all__ = ["HexViT", "hexvit_tiny"]


def _fused_attention(query, key, value, bias=None, mask=None,
                     dropout_rng=None, dropout_rate=0.0, **_):
    """Route flax attention through ``jax.nn.dot_product_attention`` (the
    XLA fused-attention path).  Measured on v5e round 5
    (``benchmarks/hexvit_attn_ab.py``): 6-block d192/T256/b32 body 0.420
    vs 0.437 ms unfused (+4%); one-block agreement 0.023 absolute in
    bf16 (softmax reassociation).  flax hands (B, T, heads, head_dim) —
    the same BTNH layout jax.nn expects."""
    return jax.nn.dot_product_attention(query, key, value, bias=bias,
                                        mask=mask)


class _Block(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        y = nn.LayerNorm(**kw)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, name="attn",
            attention_fn=_fused_attention, **kw)(y, y)
        x = x + y
        y = nn.LayerNorm(**kw)(x)
        y = nn.Dense(self.mlp_ratio * self.dim, **kw)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, **kw)(y)
        return x + y


class HexViT(nn.Module):
    """Transformer classifier on hex images (B, C, H, W), offset 0.

    Args:
        num_classes: head width.
        dim: token dimension.
        depth: transformer blocks.
        heads: attention heads.
        patch_halvings: number of stride-2 hex-conv halvings in the stem
            (tokens = (H / 2^k) * (W / 2^k)); H and W must be divisible
            by 2^k.
        radius: hex kernel radius of the stem convs.
    """

    num_classes: int = 10
    dim: int = 128
    depth: int = 4
    heads: int = 4
    patch_halvings: int = 2
    radius: int = 2
    dtype: jnp.dtype = jnp.float32        # compute dtype
    param_dtype: jnp.dtype = jnp.float32  # parameter storage (keep f32 for
                                          # optimiser update precision)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.asarray(x, self.dtype)
        b, c, h, w = x.shape
        p = 2 ** self.patch_halvings
        if h % p or w % p:
            raise ValueError(f"(H, W) = {(h, w)} must divide the patch "
                             f"factor {p}")
        widths = [max(self.dim // 2 ** (self.patch_halvings - 1 - i),
                      self.dim // 4)
                  for i in range(self.patch_halvings - 1)] + [self.dim]
        cin = c
        for i, width in enumerate(widths):
            # stride-2 'same' hex conv: halves both dims, output offset 0
            x = HexConv2d(in_channels=cin, out_channels=width,
                          even_odd_offset=0, hexkernel_radius=self.radius,
                          stride=2, padding=self.radius - 1,
                          param_dtype=self.param_dtype, dtype=self.dtype,
                          name=f"stem{i}")(x)
            if i < len(widths) - 1:
                x = nn.gelu(x)
            cin = width
        b, d, th, tw = x.shape
        tokens = x.reshape(b, d, th * tw).transpose(0, 2, 1)   # (B, T, dim)
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (1, th * tw, self.dim), self.param_dtype)
        tokens = tokens.astype(self.dtype) + pos.astype(self.dtype)
        for i in range(self.depth):
            tokens = _Block(dim=self.dim, heads=self.heads,
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name=f"block{i}")(tokens)
        tokens = nn.LayerNorm(dtype=self.dtype,
                              param_dtype=self.param_dtype)(tokens)
        pooled = tokens.mean(axis=1)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="head")(pooled)


def hexvit_tiny(num_classes: int = 10, **kw) -> HexViT:
    return HexViT(num_classes=num_classes, dim=64, depth=2, heads=2,
                  patch_halvings=1, **kw)
